"""Adapter3DRunner: model zoo + public endpoints (the framework's API).

TPU-native rebuild of `lib/apis/adapter3d.py:64-1437`: lazy model loading
keyed by checkpoint identity, shared pipeline workers, and the `run_*`
endpoints that the Web UI / gradio_client call. Differences by design:

- model params are immutable pytrees; "unloading" is dropping the reference
  (device memory freed by GC) instead of gc.collect()+empty_cache hygiene;
- every endpoint seeds jax PRNG keys (reference: set_random_seed,
  adapter3d.py:460 etc.) — determinism is the regression tool;
- checkpoints load through `models/diffusion/weights.py` converters from a
  local directory (`checkpoint_dir`); absent checkpoints fall back to seeded
  random init so the full control flow stays runnable (shapes/perf real,
  content not).
"""
import math
import os
import types
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import cameras as C
from . import parameters as P
from ..models.diffusion import (UNet2DCondition, SD15_UNET, SD21_UNET,
                                AutoencoderKL, SD_VAE, ControlNet,
                                CLIPTextModel, SD15_TEXT, schedulers as S)
from ..models.diffusion.tokenizer import CLIPTokenizer, HashTokenizer
from ..models.mesh import Mesh
from ..utils import camera as cam_utils
from ..utils.video import render_surround_video

from .endpoints import EndpointsMixin

__all__ = ["Adapter3DRunner"]


class Adapter3DRunner(EndpointsMixin):
    def __init__(self, checkpoint_dir=None, fp16=False, seed=42,
                 tiny_models=False):
        self.checkpoint_dir = checkpoint_dir
        self.seed = seed
        self.tiny = tiny_models
        self._cache = {}
        self.constants = C.CONSTANTS
        tok_dir = checkpoint_dir and os.path.join(checkpoint_dir, "tokenizer")
        if tok_dir and os.path.exists(os.path.join(tok_dir, "vocab.json")):
            self.tokenizer = CLIPTokenizer(
                os.path.join(tok_dir, "vocab.json"),
                os.path.join(tok_dir, "merges.txt"))
        else:
            self.tokenizer = HashTokenizer()

    # ------------------------------------------------------------------
    # model zoo (lazy, keyed by checkpoint name; adapter3d.py:159-423)
    # ------------------------------------------------------------------

    def _tiny_unet_cfg(self):
        from ..models.diffusion import UNetConfig
        return UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                          attn_down=(True, False), cross_attention_dim=32,
                          num_heads=4, dtype=jnp.float32)

    def _load_params(self, name, init_fn, convert_fn=None, subdir=None):
        if name in self._cache:
            return self._cache[name]
        path = None
        if self.checkpoint_dir and subdir:
            for fname in ("diffusion_pytorch_model.safetensors",
                          "diffusion_pytorch_model.bin", "model.safetensors",
                          "pytorch_model.bin", f"{subdir}.safetensors"):
                p = os.path.join(self.checkpoint_dir, subdir, fname)
                if os.path.exists(p):
                    path = p
                    break
        if path and convert_fn:
            from ..models.diffusion.weights import load_torch_state
            params, unmatched = convert_fn(load_torch_state(path))
            if unmatched:
                print(f"[runner] {name}: {len(unmatched)} unconverted keys")
        else:
            params = init_fn()
        if not self.tiny:
            # inference-only frozen nets: bf16 params halve HBM (the SD
            # UNet + 2 ControlNets alone are 6.3GB in fp32)
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params)
        self._cache[name] = params
        return params

    def load_stable_diffusion(self, checkpoint="sd15"):
        from ..models.diffusion import weights as W
        if self.tiny:
            cfg = self._tiny_unet_cfg()
            from ..models.diffusion import VAEConfig, CLIPTextConfig
            vae_cfg = VAEConfig(block_out_channels=(32, 64),
                                layers_per_block=1, dtype=jnp.float32)
            text_cfg = CLIPTextConfig(vocab_size=49408, hidden_size=32,
                                      intermediate_size=64, num_layers=2,
                                      num_heads=4)
        else:
            cfg, vae_cfg, text_cfg = SD15_UNET, SD_VAE, SD15_TEXT
        key = jax.random.PRNGKey(self.seed)
        unet = UNet2DCondition(cfg)
        vae = AutoencoderKL(vae_cfg)
        text = CLIPTextModel(text_cfg)
        lat = jnp.zeros((1, 8, 8, 4))
        t0 = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, 8, text_cfg.hidden_size))
        m = types.SimpleNamespace()
        m.unet = unet
        m.unet_params = self._load_params(
            f"unet:{checkpoint}",
            lambda: unet.init(key, lat, t0, ctx)["params"],
            lambda sd: W.convert_unet(sd), subdir="unet")
        m.vae = vae
        m.vae_params = self._load_params(
            f"vae:{checkpoint}",
            lambda: vae.init(key, jnp.zeros((1, 64, 64, 3)))["params"],
            lambda sd: W.convert_vae(sd), subdir="vae")
        m.text = text
        m.text_params = self._load_params(
            f"text:{checkpoint}",
            lambda: text.init(
                key, jnp.zeros((1, 8), jnp.int32))["params"],
            lambda sd: W.convert_clip_text(sd), subdir="text_encoder")
        m.schedule = S.sd_schedule()
        m.text_cfg = text_cfg
        return m

    def load_controlnets(self, kinds=("tile", "depth")):
        from ..models.diffusion import weights as W
        cfg = self._tiny_unet_cfg() if self.tiny else SD15_UNET
        key = jax.random.PRNGKey(self.seed + 1)
        nets, params = [], []
        # tiny VAE downsamples /2 (2 blocks) vs SD's /8 -> adapt hint stack
        hint_strides = 1 if self.tiny else 3
        lat = jnp.zeros((1, 8, 8, 4))
        t0 = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, 8, cfg.cross_attention_dim))
        hs = 8 * 2 ** hint_strides
        hint = jnp.zeros((1, hs, hs, 3))
        for kind in kinds:
            cn = ControlNet(cfg, hint_strides=hint_strides)
            p = self._load_params(
                f"controlnet:{kind}",
                lambda: cn.init(key, lat, t0, ctx, hint)["params"],
                lambda sd: W.convert_controlnet(sd),
                subdir=f"controlnet_{kind}")
            nets.append(cn)
            params.append(p)
        return tuple(nets), params

    def encode_prompt(self, m, prompts, negative_prompts):
        """(pos (N,L,C), neg (N,L,C)) text embeddings."""
        ids_p = jnp.asarray(self.tokenizer(prompts))
        ids_n = jnp.asarray(self.tokenizer(negative_prompts))
        enc = jax.jit(lambda p, i: m.text.apply({"params": p}, i))
        return enc(m.text_params, ids_p), enc(m.text_params, ids_n)

    # ------------------------------------------------------------------
    # endpoints
    # ------------------------------------------------------------------

    def run_segmentation(self, images, seed=42):
        """TRACER foreground masks. images: (N, H, W, 3) [0,1]
        (adapter3d.py:720 run_segmentation)."""
        from ..models.segmentors import TracerDecoder, tracer_segment
        if "tracer" not in self._cache:
            dec = TracerDecoder()
            params = dec.init(jax.random.PRNGKey(seed),
                              jnp.zeros((1, 64, 64, 3)))
            self._cache["tracer"] = (dec, params)
        dec, params = self._cache["tracer"]
        return tracer_segment(lambda p, x: dec.apply(p, x), params,
                              jnp.asarray(images),
                              input_size=64 if self.tiny else 640)

    def run_mesh_preproc(self, mesh_path, out_path=None):
        """Load + normalize an input mesh (adapter3d.py:677 run_mesh_preproc
        / preprocess_mesh mesh_utils.py:969)."""
        mesh = Mesh.load(mesh_path)
        center, scale = mesh.auto_size(0.9)
        if mesh.vn is None:
            mesh.auto_normal()
        if mesh.vt is None:
            mesh.auto_uv()
        if out_path:
            mesh.write(out_path)
        return {"mesh": mesh, "center": center, "scale": scale}

    def run_retex(self, mesh_path, prompt, negative_prompt="", seed=42,
                  steps=12, denoising_strength=0.7, cfg_scale=7.0,
                  num_views=None, render_size=None, n_inverse_steps=24,
                  out_path=None):
        """Re-texturing endpoint (adapter3d.py:1083 run_retex ->
        TexturePipeline)."""
        from ..pipelines import TextureConfig, TexturePipeline
        from ..models.fields import INGPConfig
        from ..ops.hash_grid import HashGridConfig
        m = self.load_stable_diffusion()
        m.controlnets, m.cn_params = self.load_controlnets()
        num_views = num_views or (4 if self.tiny else 12)
        render_size = render_size or (64 if self.tiny else 512)
        from ..ops.dense_grid import DenseGridConfig
        ingp = INGPConfig(
            backend="dense",
            dense=DenseGridConfig(
                resolutions=(8, 32) if self.tiny else (32, 160)),
            hash=HashGridConfig(
                n_levels=4 if self.tiny else 12,
                log2_hashmap_size=12 if self.tiny else 19,
                base_resolution=4 if self.tiny else 16,
                max_resolution=32 if self.tiny else 320))
        cfg = TextureConfig(
            num_views=num_views, render_size=render_size,
            diffusion_steps=steps, denoising_strength=denoising_strength,
            guidance_scale=cfg_scale, n_inverse_steps=n_inverse_steps,
            ingp=ingp)
        pre = self.run_mesh_preproc(mesh_path)
        mesh = pre["mesh"]
        c = self.constants
        poses, intr = C.surround_rig(
            num_views, c["proc_3d_to_3d_camera_distance"],
            c["proc_3d_to_3d_fov"], c["proc_retex_min_elev"],
            c["proc_retex_max_elev"], render_size,
            rng=np.random.default_rng(seed))
        pos_e, neg_e = self.encode_prompt(
            m, [prompt] * num_views, [negative_prompt] * num_views)
        pipe = TexturePipeline(m, cfg)
        out = pipe(mesh, jnp.asarray(poses), jnp.asarray(intr), pos_e,
                   neg_e, jax.random.PRNGKey(seed))
        if out_path:
            out["mesh"].write(out_path, flip_yz=True)
        return out

    def run_mesh_to_video(self, mesh_path, out_path="out.mp4",
                          num_frames=60, render_size=None, elev=0.2,
                          distance=3.0, fov=40.0, seed=42):
        """Orbit video of a textured mesh (adapter3d.py:1212
        run_mesh_to_video)."""
        from ..models.mesh import (RasterConfig, render_views,
                                   build_mipmaps, sample_texture,
                                   interpolate, rasterize, project_mesh)
        render_size = render_size or (64 if self.tiny else 512)
        mesh = Mesh.load(mesh_path)
        rc = RasterConfig(height=render_size, width=render_size)
        verts = jnp.asarray(mesh.v)
        faces = jnp.asarray(mesh.f)
        fmask = jnp.ones((len(mesh.f),), bool)
        uv_attr = None
        if mesh.vt is not None and mesh.albedo is not None:
            # unweld uvs onto vertices if needed
            if len(mesh.vt) == len(mesh.v):
                uv_attr = jnp.asarray(mesh.vt)
        intr = cam_utils.intrinsics_from_fov(fov, render_size, render_size)
        pose0 = cam_utils.get_pose_from_angles(
            np.array([0.0]), np.array([elev]), distance)[0]
        tex = jnp.asarray(mesh.albedo) if mesh.albedo is not None else None

        def render_frame(pose, intrinsics):
            out = render_views(verts, faces, fmask,
                               jnp.asarray(pose)[None],
                               jnp.asarray(intrinsics)[None], rc,
                               vert_attrs={"uv": uv_attr}
                               if uv_attr is not None else None)
            a = out["alpha"][0]
            if uv_attr is not None and tex is not None:
                from ..models.mesh.texture import _sample_level
                rgb = _sample_level(tex, out["uv"][0])
            else:
                rgb = out["normal"][0] * 0.5 + 0.5
            return np.asarray(jnp.clip(rgb * a + (1 - a), 0, 1))

        return render_surround_video(render_frame, pose0, intr,
                                     num_frames=num_frames, path=out_path)
