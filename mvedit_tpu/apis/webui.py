"""Gradio Web UI: full tab tree + named API endpoints + send-to wiring.

Rebuilds `app.py:94-267` + `lib/core/webui/`: the tab structure
(Text-to-3D {StableSSDNeRF, Text-to-Image-to-3D}, Image-to-3D {Zero123++
v1.1, v1.2}, 3D-to-3D {MVEdit, MVEdit Instruct}, Re-Texturing {MVEdit,
MVEdit Instruct}, Tools {Export video}) with the reference's named api
endpoints, so gradio_client scripts written against the reference keep
working:

  text_to_3d_stablessdnerf, text_to_3d_stablessdnerf_to_mesh, text_to_img,
  image_segmentation, img_to_3d_1_1_zero123plus,
  img_to_3d_1_1_zero123plus_to_mesh, img_to_3d_1_2_zero123plus,
  img_to_3d_1_2_zero123plus_to_mesh, 3d_preproc, 3d_to_3d_mvedit,
  3d_to_3d_mvedit_instruct, retex_mvedit, retex_mvedit_instruct,
  mesh_to_video

Gradio is an optional dependency; `apis/server.py` provides the same
endpoints over plain HTTP JSON without it.
"""
import json
import os
import tempfile
import uuid

import numpy as np

__all__ = ["build_app"]


def _cache_dir():
    d = os.path.join(tempfile.gettempdir(), "mvedit_webui")
    os.makedirs(d, exist_ok=True)
    return d


def _out_path(suffix=".glb"):
    return os.path.join(_cache_dir(), f"output_{uuid.uuid4()}{suffix}")


def _shared_3d_opts(gr, advanced, prompt=True, instruct=False):
    """Common generation controls (lib/core/webui/shared_opts.py subset)."""
    var = {}
    if prompt:
        var["prompt"] = gr.Textbox(
            label="Instruction" if instruct else "Prompt")
        if not instruct:
            var["negative_prompt"] = gr.Textbox(label="Negative prompt")
    var["seed"] = gr.Number(value=42, precision=0, label="Seed")
    with gr.Accordion("Advanced settings", open=bool(advanced)):
        var["steps"] = gr.Slider(4, 100, value=24, step=1,
                                 label="Sampling steps")
        var["denoising_strength"] = gr.Slider(
            0.0, 1.0, value=1.0, step=0.01, label="Denoising strength")
        var["cfg_scale"] = gr.Slider(1.0, 30.0, value=7.0, step=0.5,
                                     label="CFG scale")
    return var


def build_app(runner, advanced=False, debug=False):
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is not installed; use mvedit_tpu.apis.server.ApiServer "
            "for the HTTP JSON API instead") from e

    # ---------------- endpoint adapters ---------------------------------

    def seg_fn(image):
        mask = runner.run_segmentation(
            np.asarray(image, np.float32)[None] / 255.0)
        m = np.asarray(mask[0])
        rgba = np.concatenate(
            [np.asarray(image, np.float32) / 255.0, m], axis=-1)
        return (np.clip(rgba, 0, 1) * 255).astype(np.uint8)

    def preproc_fn(mesh_path):
        out = _out_path(".glb")
        pre = runner.run_mesh_preproc(mesh_path, out_path=out)
        return out, json.dumps({
            "mesh_path": out,
            "center": np.asarray(pre["center"]).tolist(),
            "scale": float(np.asarray(pre["scale"]).reshape(-1)[0])
            if np.ndim(pre["scale"]) else float(pre["scale"]),
        })

    def z123_fn(image, seed):
        return runner.run_zero123plus(
            np.asarray(image, np.float32) / 255.0, seed=int(seed)) * 255

    def z123_12_fn(image, seed):
        return runner.run_zero123plus1_2(
            np.asarray(image, np.float32) / 255.0, seed=int(seed)) * 255

    def img_to_3d_fn(version):
        def run(image, prompt, negative_prompt, seed, steps,
                denoising_strength, cfg_scale):
            out = _out_path(".glb")
            runner.run_zero123plus_to_mesh(
                np.asarray(image, np.float32) / 255.0, seed=int(seed),
                out_path=out, version=version, prompt=prompt,
                negative_prompt=negative_prompt, steps=int(steps))
            return out
        return run

    def t3d_fn(mesh_path, prompt, negative_prompt, seed, steps,
               denoising_strength, cfg_scale, instruct=False):
        out = _out_path(".glb")
        runner.run_3d_to_3d(mesh_path, prompt,
                            negative_prompt=negative_prompt or "",
                            seed=int(seed), steps=int(steps),
                            instruct=instruct, out_path=out)
        return out

    def retex_fn(mesh_path, prompt, negative_prompt, seed, steps,
                 denoising_strength, cfg_scale, instruct=False):
        out = _out_path(".glb")
        runner.run_retex(mesh_path, prompt,
                         negative_prompt=negative_prompt or "",
                         seed=int(seed), steps=int(steps),
                         denoising_strength=float(denoising_strength),
                         cfg_scale=float(cfg_scale), instruct=instruct,
                         out_path=out)
        return out

    def ssdnerf_fn(prompt, negative_prompt, seed, steps,
                   denoising_strength, cfg_scale):
        out = runner.run_stablessdnerf(prompt, seed=int(seed),
                                       cfg_scale=float(cfg_scale))
        prev = (np.clip(out["preview"], 0, 1) * 255).astype(np.uint8)
        return prev

    def ssdnerf_mesh_fn(prompt, negative_prompt, seed, steps,
                        denoising_strength, cfg_scale):
        out = _out_path(".glb")
        runner.run_stablessdnerf_to_mesh(
            prompt, seed=int(seed), out_path=out,
            negative_prompt=negative_prompt or "")
        return out

    def t2i_fn(width, height, prompt, negative_prompt, seed, steps,
               denoising_strength, cfg_scale):
        img = runner.run_text_to_img(
            prompt, negative_prompt=negative_prompt or "", seed=int(seed),
            width=int(width), height=int(height), steps=int(steps),
            cfg_scale=float(cfg_scale))
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    def video_fn(mesh_path):
        out = _out_path(".mp4")
        runner.run_mesh_to_video(mesh_path, out_path=out)
        return out

    # ---------------- layout ---------------------------------------------

    send_targets = {}

    def send_buttons(gr, var, output, with_prompts=True):
        """Cross-tab "send to" buttons (app.py:188-267)."""
        with gr.Row():
            var["to_text_3d_to_3d"] = gr.Button("Send to 3D-to-3D")
            var["to_instruct_3d_to_3d"] = gr.Button(
                "Send to 3D-to-3D (instruct)")
            var["to_text_retex"] = gr.Button("Send to Re-Texturing")
            var["to_instruct_retex"] = gr.Button(
                "Send to Re-Texturing (instruct)")
            var["export_video_mesh"] = gr.Button("Export video")
        var["output"] = output

    with gr.Blocks(title="3D-Adapter / MVEdit (TPU-native)") as app:
        gr.Markdown("# 3D-Adapter / MVEdit — TPU-native")
        tab_vars = []
        with gr.Tabs():
            with gr.TabItem("Text-to-3D"):
                with gr.Tabs():
                    with gr.TabItem("StableSSDNeRF (ShapeNet Cars)/MVEdit"):
                        v = _shared_3d_opts(gr, advanced)
                        prev = gr.Image(label="Preview")
                        out3d = gr.Model3D(label="Output mesh")
                        args = [v["prompt"], v["negative_prompt"],
                                v["seed"], v["steps"],
                                v["denoising_strength"], v["cfg_scale"]]
                        gr.Button("Sample SSDNeRF").click(
                            ssdnerf_fn, args, [prev],
                            api_name="text_to_3d_stablessdnerf")
                        gr.Button("Refine to mesh").click(
                            ssdnerf_mesh_fn, args, [out3d],
                            api_name="text_to_3d_stablessdnerf_to_mesh")
                        send_buttons(gr, v, out3d)
                        tab_vars.append(v)
                    with gr.TabItem("Text-to-Image-to-3D"):
                        v = _shared_3d_opts(gr, advanced)
                        w = gr.Slider(256, 1024, value=512, step=64,
                                      label="Width")
                        h = gr.Slider(256, 1024, value=512, step=64,
                                      label="Height")
                        img_out = gr.Image(label="Image")
                        gr.Button("Generate image").click(
                            t2i_fn,
                            [w, h, v["prompt"], v["negative_prompt"],
                             v["seed"], v["steps"],
                             v["denoising_strength"], v["cfg_scale"]],
                            [img_out], api_name="text_to_img")
                        v["output_image"] = img_out
            with gr.TabItem("Image-to-3D"):
                with gr.Tabs():
                    for version, seg_api in (("1.1", "image_segmentation"),
                                             ("1.2", False)):
                        vt = version.replace(".", "_")
                        with gr.TabItem(f"Zero123++ v{version}/MVEdit"):
                            v = {}
                            in_img = gr.Image(label="Input image")
                            seg_out = gr.Image(label="Segmented")
                            gr.Button("Segment").click(
                                seg_fn, [in_img], [seg_out],
                                api_name=seg_api)
                            grid_out = gr.Image(label="6 views")
                            vv = _shared_3d_opts(gr, advanced)
                            v.update(vv)
                            v["in_image"] = in_img
                            gr.Button("Generate views").click(
                                z123_fn if version == "1.1" else z123_12_fn,
                                [in_img, vv["seed"]], [grid_out],
                                api_name=f"img_to_3d_{vt}_zero123plus")
                            out3d = gr.Model3D(label="Output mesh")
                            gr.Button("Generate 3D").click(
                                img_to_3d_fn(version),
                                [in_img, vv["prompt"],
                                 vv["negative_prompt"], vv["seed"],
                                 vv["steps"], vv["denoising_strength"],
                                 vv["cfg_scale"]],
                                [out3d],
                                api_name=f"img_to_3d_{vt}_"
                                         "zero123plus_to_mesh")
                            send_buttons(gr, v, out3d)
                            tab_vars.append(v)
            with gr.TabItem("3D-to-3D"):
                with gr.Tabs():
                    for instruct, api in ((False, "3d_to_3d_mvedit"),
                                          (True,
                                           "3d_to_3d_mvedit_instruct")):
                        name = "MVEdit Instruct" if instruct else "MVEdit"
                        with gr.TabItem(name):
                            v = {}
                            in_mesh = gr.Model3D(label="Input mesh")
                            proc = gr.Textbox(label="Preproc state",
                                              visible=bool(debug))
                            pre_btn = gr.Button("Preprocess")
                            pre_btn.click(
                                preproc_fn, [in_mesh], [in_mesh, proc],
                                api_name="3d_preproc" if not instruct
                                else False)
                            vv = _shared_3d_opts(gr, advanced,
                                                 instruct=instruct)
                            v.update(vv)
                            v["in_mesh"] = in_mesh
                            v["instruct"] = instruct
                            v["preproc_kwargs"] = dict(
                                fn=preproc_fn, inputs=[in_mesh],
                                outputs=[in_mesh, proc])
                            out3d = gr.Model3D(label="Output mesh")
                            neg = vv.get("negative_prompt") or gr.Textbox(
                                visible=False)
                            gr.Button("Run MVEdit").click(
                                (lambda m, p, n, s, st, d, c, i=instruct:
                                 t3d_fn(m, p, n, s, st, d, c, instruct=i)),
                                [in_mesh, vv["prompt"], neg, vv["seed"],
                                 vv["steps"], vv["denoising_strength"],
                                 vv["cfg_scale"]],
                                [out3d], api_name=api)
                            send_buttons(gr, v, out3d)
                            tab_vars.append(v)
            with gr.TabItem("Re-Texturing"):
                with gr.Tabs():
                    for instruct, api in ((False, "retex_mvedit"),
                                          (True, "retex_mvedit_instruct")):
                        name = "MVEdit Instruct" if instruct else "MVEdit"
                        with gr.TabItem(name):
                            v = {}
                            in_mesh = gr.Model3D(label="Input mesh")
                            vv = _shared_3d_opts(gr, advanced,
                                                 instruct=instruct)
                            v.update(vv)
                            v["in_mesh"] = in_mesh
                            v["instruct"] = instruct
                            v["is_retex"] = True
                            out3d = gr.Model3D(label="Output mesh")
                            neg = vv.get("negative_prompt") or gr.Textbox(
                                visible=False)
                            gr.Button("Re-texture").click(
                                (lambda m, p, n, s, st, d, c, i=instruct:
                                 retex_fn(m, p, n, s, st, d, c,
                                          instruct=i)),
                                [in_mesh, vv["prompt"], neg, vv["seed"],
                                 vv["steps"], vv["denoising_strength"],
                                 vv["cfg_scale"]],
                                [out3d], api_name=api)
                            send_buttons(gr, v, out3d)
                            tab_vars.append(v)
            with gr.TabItem("Tools"):
                with gr.TabItem("Export video (mesh)"):
                    vid_mesh = gr.Model3D(label="Mesh")
                    send_targets["video_mesh"] = vid_mesh
                    out_vid = gr.Video(label="Orbit video")
                    gr.Button("Export").click(
                        video_fn, [vid_mesh], [out_vid],
                        api_name="mesh_to_video")

        # -------- cross-tab send-to wiring (app.py:188-267) --------------
        mesh_tabs = [v for v in tab_vars if "in_mesh" in v]

        def find_tab(instruct, retex):
            for t in mesh_tabs:
                if bool(t.get("instruct")) == instruct \
                        and bool(t.get("is_retex")) == retex:
                    return t
            return None

        routes = {"to_text_3d_to_3d": (False, False),
                  "to_instruct_3d_to_3d": (True, False),
                  "to_text_retex": (False, True),
                  "to_instruct_retex": (True, True)}
        for v in tab_vars:
            out = v.get("output")
            if out is None:
                continue
            for key, (instr, retex) in routes.items():
                tgt = find_tab(instr, retex)
                if key in v and tgt is not None:
                    v[key].click(lambda m: m, [out], [tgt["in_mesh"]],
                                 api_name=False)
            if "export_video_mesh" in v:
                v["export_video_mesh"].click(
                    lambda m: m, [out], [send_targets["video_mesh"]],
                    api_name=False)
    return app
