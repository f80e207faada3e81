"""JSON API server (stdlib) exposing the public endpoints.

The reference fronts everything with Gradio named endpoints
(`app.py:94-186`: text_to_3d_stablessdnerf*, image_segmentation,
img_to_3d_1_{1,2}_zero123plus*, 3d_preproc, 3d_to_3d_mvedit*, retex_mvedit*,
mesh_to_video). Gradio is not available in every deployment; this server
provides the same endpoint names over plain HTTP JSON + file payloads so
`scripts/example_webui_api_local.py`-style clients can port directly.

POST /api/<endpoint> with a JSON body of the positional args (the
`parameters.py` ordered contract); binary inputs/outputs are base64 fields.
"""
import base64
import io
import json
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

__all__ = ["ApiServer"]


class ApiServer:
    def __init__(self, runner, host="127.0.0.1", port=7860):
        self.runner = runner
        self.host = host
        self.port = port
        self._httpd = None
        self.endpoints = {
            "image_segmentation": self._image_segmentation,
            "3d_preproc": self._mesh_preproc,
            "text_to_img": self._text_to_img,
            "text_to_3d_stablessdnerf": self._stablessdnerf,
            "text_to_3d_stablessdnerf_to_mesh": self._stablessdnerf_to_mesh,
            "img_to_3d_1_1_zero123plus": self._zero123plus("1.1"),
            "img_to_3d_1_2_zero123plus": self._zero123plus("1.2"),
            "img_to_3d_1_1_zero123plus_to_mesh":
                self._zero123plus_to_mesh("1.1"),
            "img_to_3d_1_2_zero123plus_to_mesh":
                self._zero123plus_to_mesh("1.2"),
            "3d_to_3d_mvedit": self._3d_to_3d(False),
            "3d_to_3d_mvedit_instruct": self._3d_to_3d(True),
            "retex_mvedit": self._retex(False),
            "retex_mvedit_instruct": self._retex(True),
            "texture_superres": self._texture_superres,
            "mesh_to_video": self._mesh_to_video,
            "health": lambda body: {"status": "ok"},
        }

    # --- endpoint impls -------------------------------------------------

    def _decode_image(self, b64):
        from PIL import Image
        img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
        return np.asarray(img, np.float32) / 255.0

    def _encode_image(self, arr):
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)
                        ).save(buf, format="png")
        return base64.b64encode(buf.getvalue()).decode()

    def _image_segmentation(self, body):
        img = self._decode_image(body["image"])
        mask = self.runner.run_segmentation(img[None])
        return {"mask": self._encode_image(
            np.asarray(mask[0]).repeat(3, axis=-1))}

    def _mesh_preproc(self, body):
        with tempfile.NamedTemporaryFile(suffix=".glb") as f:
            f.write(base64.b64decode(body["mesh"]))
            f.flush()
            out = self.runner.run_mesh_preproc(f.name)
        return {"center": np.asarray(out["center"]).tolist(),
                "scale": float(out["scale"]),
                "num_verts": int(len(out["mesh"].v)),
                "num_faces": int(len(out["mesh"].f))}

    def _retex(self, instruct):
        def fn(body):
            with tempfile.NamedTemporaryFile(suffix=".glb") as fin, \
                    tempfile.NamedTemporaryFile(suffix=".glb") as fout:
                fin.write(base64.b64decode(body["mesh"]))
                fin.flush()
                self.runner.run_retex(
                    fin.name, body.get("prompt", ""),
                    body.get("negative_prompt", ""),
                    seed=body.get("seed", 42),
                    steps=body.get("steps", 12), instruct=instruct,
                    front_view_id=body.get("front_view_id"),
                    out_path=fout.name)
                data = open(fout.name, "rb").read()
            return {"mesh": base64.b64encode(data).decode()}
        return fn

    def _text_to_img(self, body):
        img = self.runner.run_text_to_img(
            body.get("prompt", ""), body.get("negative_prompt", ""),
            seed=body.get("seed", 42), steps=body.get("steps", 24),
            cfg_scale=body.get("cfg_scale", 7.0),
            width=body.get("width"), height=body.get("height"))
        return {"image": self._encode_image(img)}

    def _stablessdnerf(self, body):
        out = self.runner.run_stablessdnerf(
            body.get("prompt", ""), seed=body.get("seed", 42),
            cfg_scale=body.get("cfg_scale", 7.0))
        return {"preview": self._encode_image(out["preview"])}

    def _stablessdnerf_to_mesh(self, body):
        with tempfile.NamedTemporaryFile(suffix=".glb") as fout:
            self.runner.run_stablessdnerf_to_mesh(
                body.get("prompt", ""), seed=body.get("seed", 42),
                out_path=fout.name)
            data = open(fout.name, "rb").read()
        return {"mesh": base64.b64encode(data).decode()}

    def _zero123plus(self, version):
        def fn(body):
            grid = self.runner.run_zero123plus(
                self._decode_image(body["image"]),
                seed=body.get("seed", 42), version=version)
            return {"views": self._encode_image(np.asarray(grid))}
        return fn

    def _zero123plus_to_mesh(self, version):
        def fn(body):
            with tempfile.NamedTemporaryFile(suffix=".glb") as fout:
                self.runner.run_zero123plus_to_mesh(
                    self._decode_image(body["image"]),
                    seed=body.get("seed", 42), version=version,
                    prompt=body.get("prompt", ""),
                    negative_prompt=body.get("negative_prompt", ""),
                    out_path=fout.name)
                data = open(fout.name, "rb").read()
            return {"mesh": base64.b64encode(data).decode()}
        return fn

    def _3d_to_3d(self, instruct):
        def fn(body):
            with tempfile.NamedTemporaryFile(suffix=".glb") as fin, \
                    tempfile.NamedTemporaryFile(suffix=".glb") as fout:
                fin.write(base64.b64decode(body["mesh"]))
                fin.flush()
                self.runner.run_3d_to_3d(
                    fin.name, body.get("prompt", ""),
                    body.get("negative_prompt", ""),
                    seed=body.get("seed", 42),
                    steps=body.get("steps"), instruct=instruct,
                    out_path=fout.name)
                data = open(fout.name, "rb").read()
            return {"mesh": base64.b64encode(data).decode()}
        return fn

    def _texture_superres(self, body):
        with tempfile.NamedTemporaryFile(suffix=".glb") as fin, \
                tempfile.NamedTemporaryFile(suffix=".glb") as fout:
            fin.write(base64.b64decode(body["mesh"]))
            fin.flush()
            self.runner.run_texture_superres(
                fin.name, body.get("prompt", ""),
                body.get("negative_prompt", ""),
                seed=body.get("seed", 42), out_path=fout.name)
            data = open(fout.name, "rb").read()
        return {"mesh": base64.b64encode(data).decode()}

    def _mesh_to_video(self, body):
        with tempfile.NamedTemporaryFile(suffix=".glb") as fin, \
                tempfile.NamedTemporaryFile(suffix=".mp4") as fout:
            fin.write(base64.b64decode(body["mesh"]))
            fin.flush()
            path = self.runner.run_mesh_to_video(
                fin.name, out_path=fout.name,
                num_frames=body.get("num_frames", 30))
            data = open(path, "rb").read()
        return {"video": base64.b64encode(data).decode(),
                "format": path.rsplit(".", 1)[-1]}

    # --- server ---------------------------------------------------------

    def serve(self, background=False):
        endpoints = self.endpoints

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                name = self.path.strip("/").split("/")[-1]
                fn = endpoints.get(name)
                if fn is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or b"{}")
                try:
                    out = fn(body)
                    data = json.dumps(out).encode()
                    self.send_response(200)
                except Exception as e:  # degrade like the reference UI
                    data = json.dumps({"error": str(e)}).encode()
                    self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            do_GET = do_POST

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        if background:
            t = threading.Thread(target=self._httpd.serve_forever,
                                 daemon=True)
            t.start()
            return t
        self._httpd.serve_forever()

    def shutdown(self):
        if self._httpd:
            self._httpd.shutdown()
