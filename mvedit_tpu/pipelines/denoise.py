"""Jitted multiview denoise steps (Adapter3DMixin equivalent).

Rebuilds `lib/pipelines/adapter3d_mixin.py:68-317` as compiled functions:

- 1-pass (`get_noise_pred` :68-135): ALL ControlNets (tile, depth, extras
  such as ip2p) -> UNet, CFG combine `gs * cond + (1 - gs) * uncond`;
- 2-pass (`get_noise_pred_p1`/`p2` :137-317): pass 1 runs the UNet encoder
  once and the decoder with ControlNets `nets[skip:]` where skip=1 when a
  depth hint is given, else skip=2 (so the 3D pipeline's p1 applies only
  the extra nets, e.g. instruct-pix2pix; the texture pipeline's p1 adds
  depth) — the x0 estimate for the 3D fuse. Pass 2 re-runs only the
  DECODER with tile(+depth) ControlNet residuals ADDED to the p1
  residuals (:281-299), reusing the encoder state (~40% UNet FLOPs saved);
- extra ControlNets (instruct mode): conditioned on per-net images
  (default: the initial source renders, `mvedit_3d_pipeline.py:358-361`)
  at scale 1.0 in BOTH p1 and the 1-pass path (`adapter3d.py:965-969`
  loads ip2p third; `get_noise_pred_p1` applies nets[controlnet_skip:]).

All functions treat the full CFG batch (2N views) in ONE UNet call with
joint attention over N views — on TPU one big batch beats the reference's
--diff-bs micro-batching loop.
"""
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.diffusion import AttnMode
from ..models.diffusion.controlnet import apply_multi_controlnet

__all__ = ["DenoiseModels", "make_noise_pred_1pass", "make_noise_pred_2pass",
           "make_chunked_noise_pred_1pass", "make_chunked_noise_pred_2pass"]


@dataclass(frozen=True)
class DenoiseModels:
    """Static bundle: module defs (not params) + attention options.

    use_reference=True reproduces the reference's default conditioning
    (`mvedit_3d_pipeline.py:892,1226-1232`): the UNCOND pass runs
    per-view (no cross-image attention at all — the reference only ever
    sets num_cross_attn_imgs on the cond pass), and the COND pass pairs
    each view's noisy REFERENCE latent with its target latent
    (adapter3d_mixin.py:86-127 latent_shape[2]==2*latent_shape[3]
    reshape trick) so they jointly self-attend (k=2). This is also ~2.4x
    cheaper than all-view joint attention at 6 views.

    num_views>1 without use_reference gives all-view joint attention —
    kept as an opt-in extension beyond the reference.
    """
    unet: object
    controlnets: Tuple[object, ...]   # (tile, depth[, extra...]) modules
    num_views: int = 6
    ip_tokens: int = 0
    ip_scale: float = 1.0
    use_reference: bool = False

    def attn_mode(self, num_views=None):
        return AttnMode(num_views=num_views or self.num_views,
                        ip_tokens=self.ip_tokens, ip_scale=self.ip_scale)


def _cfg_combine(noise_pred, guidance_scale):
    uncond, cond = jnp.split(noise_pred, 2, axis=0)
    return guidance_scale * cond + (1.0 - guidance_scale) * uncond


def _pair(ref, tgt):
    """Interleave [ref_i, tgt_i] pairs: (N,h,w,C) x2 -> (2N,h,w,C)."""
    N = tgt.shape[0]
    return jnp.stack([ref, tgt], axis=1).reshape(2 * N, *tgt.shape[1:])


def _unpair_target(x):
    """(2N, ...) interleaved pairs -> the target halves (N, ...)."""
    return x.reshape(x.shape[0] // 2, 2, *x.shape[1:])[:, 1]


def _pad_pair_residuals(downs, mid):
    """Zero-pad ControlNet residuals for the reference half of each pair
    (adapter3d_mixin.py:186-192)."""
    def pad(r):
        z = jnp.zeros_like(r)
        return jnp.stack([z, r], axis=1).reshape(2 * r.shape[0],
                                                 *r.shape[1:])
    if downs is None:
        return None, None
    return [pad(r) for r in downs], pad(mid)


def make_noise_pred_1pass(models: DenoiseModels):
    """(unet_params, cn_params, latents, t, embeds, cond_images,
    cn_scales, gs, ip_context) -> guided noise pred.

    latents: (2N, h, w, 4) CFG batch (uncond first half);
    cond_images: sequence of len(controlnets) (2N, H, W, 3) hints
    (tile, depth, *extras); cn_scales: matching scalars.
    """
    @jax.jit
    def noise_pred(unet_params, cn_params, latents, t, embeds, cond_images,
                   cn_scales, guidance_scale, ip_context=None,
                   ref_noisy=None):
        n = len(models.controlnets)
        downs, mid = apply_multi_controlnet(
            models.controlnets, cn_params[:n], latents, t, embeds,
            list(cond_images)[:n], list(cn_scales)[:n], mode=AttnMode(),
            ip_context=None)
        if models.use_reference and ref_noisy is not None:
            # latents here are the (2N,) CFG target batch; the cond half
            # runs as [ref, target] pairs (get_noise_pred :86-127)
            N = latents.shape[0] // 2
            eps_u = models.unet.apply(
                {"params": unet_params}, latents[:N], t[:N], embeds[:N],
                mode=AttnMode(ip_tokens=models.ip_tokens,
                              ip_scale=models.ip_scale),
                ip_context=None if ip_context is None else ip_context[:N],
                down_block_res=[r[:N] for r in downs],
                mid_block_res=mid[:N])
            pair_lat = _pair(ref_noisy, latents[N:])
            pd, pm = _pad_pair_residuals([r[N:] for r in downs], mid[N:])
            ip2 = None if ip_context is None \
                else jnp.repeat(ip_context[N:], 2, axis=0)
            eps_pairs = models.unet.apply(
                {"params": unet_params}, pair_lat,
                jnp.repeat(t[N:], 2, 0), jnp.repeat(embeds[N:], 2, 0),
                mode=AttnMode(num_views=2, ip_tokens=models.ip_tokens,
                              ip_scale=models.ip_scale),
                ip_context=ip2, down_block_res=pd, mid_block_res=pm)
            eps_c = _unpair_target(eps_pairs)
            return guidance_scale * eps_c + (1 - guidance_scale) * eps_u
        eps = models.unet.apply(
            {"params": unet_params}, latents, t, embeds,
            mode=models.attn_mode(), ip_context=ip_context,
            down_block_res=downs, mid_block_res=mid)
        return _cfg_combine(eps, guidance_scale)

    return noise_pred


def make_noise_pred_2pass(models: DenoiseModels):
    """Returns (p1, p2).

    p1(unet_params, cn_params, latents, t, embeds, depth_images,
       depth_scale, gs, ip_context, extra_images, extra_scales)
       -> (eps_guided, enc_state, p1_residuals)
       — encoder once; decoder with nets[skip:] control: depth (when
       depth_images is not None) plus every extra net (ip2p etc.),
       matching adapter3d_mixin.py:172-186 (controlnet_skip).
    p2(unet_params, cn_params, latents, enc_state, p1_residuals, t, embeds,
       tile_images, depth_images, tile_scale, depth_scale, gs, ip_context)
       -> eps_guided — decoder re-run with tile(+depth) residuals ADDED to
       the p1 residuals (adapter3d_mixin.py:281-299).
    """
    def _ref_split_run(unet_params, latents, t, embeds, downs, mid,
                       ref_noisy, guidance_scale, ip_context,
                       enc_state=None):
        """Run uncond (per-view) + cond ([ref, target] pairs) decoders,
        CFG-combine. Returns (eps, (enc_u, enc_c)) — enc states reused by
        p2 when enc_state is None (p1) or consumed (p2)."""
        N = latents.shape[0] // 2
        amode_u = AttnMode(ip_tokens=models.ip_tokens,
                           ip_scale=models.ip_scale)
        amode_c = AttnMode(num_views=2, ip_tokens=models.ip_tokens,
                           ip_scale=models.ip_scale)
        ip_u = None if ip_context is None else ip_context[:N]
        ip_c = None if ip_context is None \
            else jnp.repeat(ip_context[N:], 2, axis=0)
        pair_lat = _pair(ref_noisy, latents[N:])
        t_u, e_u = t[:N], embeds[:N]
        t_c = jnp.repeat(t[N:], 2, 0)
        e_c = jnp.repeat(embeds[N:], 2, 0)
        downs_u = None if downs is None else [r[:N] for r in downs]
        mid_u = None if mid is None else mid[:N]
        if downs is None:
            downs_c = mid_c = None
        else:
            downs_c, mid_c = _pad_pair_residuals(
                [r[N:] for r in downs], mid[N:])
        if enc_state is None:
            enc_u = models.unet.apply(
                {"params": unet_params}, latents[:N], t_u, e_u,
                part="enc", mode=amode_u, ip_context=ip_u)
            enc_c = models.unet.apply(
                {"params": unet_params}, pair_lat, t_c, e_c,
                part="enc", mode=amode_c, ip_context=ip_c)
        else:
            enc_u, enc_c = enc_state
        eps_u = models.unet.apply(
            {"params": unet_params}, latents[:N], t_u, e_u,
            part="dec", enc_state=enc_u, mode=amode_u, ip_context=ip_u,
            down_block_res=downs_u, mid_block_res=mid_u)
        eps_pairs = models.unet.apply(
            {"params": unet_params}, pair_lat, t_c, e_c,
            part="dec", enc_state=enc_c, mode=amode_c, ip_context=ip_c,
            down_block_res=downs_c, mid_block_res=mid_c)
        eps_c = _unpair_target(eps_pairs)
        eps = guidance_scale * eps_c + (1 - guidance_scale) * eps_u
        return eps, (enc_u, enc_c)

    def p1(unet_params, cn_params, latents, t, embeds, depth_images,
           depth_scale, guidance_scale, ip_context=None,
           extra_images=(), extra_scales=(), ref_noisy=None):
        mode = models.attn_mode()
        use_depth = depth_images is not None and len(models.controlnets) > 1
        nets, params, conds, scales = [], [], [], []
        if use_depth:
            nets.append(models.controlnets[1])
            params.append(cn_params[1])
            conds.append(depth_images)
            scales.append(depth_scale)
        n_extra = len(models.controlnets) - 2
        for j in range(max(n_extra, 0)):
            if j < len(extra_images):
                nets.append(models.controlnets[2 + j])
                params.append(cn_params[2 + j])
                conds.append(extra_images[j])
                scales.append(extra_scales[j] if j < len(extra_scales)
                              else 1.0)
        if nets:
            downs, mid = apply_multi_controlnet(
                tuple(nets), params, latents, t, embeds, conds, scales,
                mode=AttnMode())
        else:
            downs, mid = None, None
        if models.use_reference and ref_noisy is not None:
            eps, enc = _ref_split_run(unet_params, latents, t, embeds,
                                      downs, mid, ref_noisy,
                                      guidance_scale, ip_context)
            return eps, enc, (downs, mid)
        enc = models.unet.apply({"params": unet_params}, latents, t, embeds,
                                part="enc", mode=mode, ip_context=ip_context)
        eps = models.unet.apply({"params": unet_params}, latents, t, embeds,
                                part="dec", enc_state=enc, mode=mode,
                                ip_context=ip_context,
                                down_block_res=downs, mid_block_res=mid)
        return _cfg_combine(eps, guidance_scale), enc, (downs, mid)

    def p2(unet_params, cn_params, latents, enc_state, p1_residuals, t,
           embeds, tile_images, depth_images, tile_scale, depth_scale,
           guidance_scale, ip_context=None, ref_noisy=None):
        mode = models.attn_mode()
        nets = models.controlnets[:2] if depth_images is not None \
            else models.controlnets[:1]
        params2 = cn_params[:2] if depth_images is not None else cn_params[:1]
        conds = [tile_images] + ([depth_images]
                                 if depth_images is not None else [])
        scales = [tile_scale] + ([depth_scale]
                                 if depth_images is not None else [])
        downs, mid = apply_multi_controlnet(
            nets, params2, latents, t, embeds, conds, scales, mode=AttnMode())
        p1_downs, p1_mid = p1_residuals
        if p1_downs is not None:
            downs = [a + b for a, b in zip(downs, p1_downs)]
            mid = mid + p1_mid
        if models.use_reference and ref_noisy is not None:
            eps, _ = _ref_split_run(unet_params, latents, t, embeds,
                                    downs, mid, ref_noisy, guidance_scale,
                                    ip_context, enc_state=enc_state)
            return eps
        eps = models.unet.apply({"params": unet_params}, latents, t, embeds,
                                part="dec", enc_state=enc_state, mode=mode,
                                ip_context=ip_context,
                                down_block_res=downs, mid_block_res=mid)
        return _cfg_combine(eps, guidance_scale)

    return jax.jit(p1), jax.jit(p2)


# ---------------------------------------------------------------------------
# diff_bs view chunking (the reference's --diff-bs, app.py:36; per-batch
# loops in adapter3d_mixin.py get_noise_pred*). In use_reference mode the
# UNet has NO cross-view attention (uncond runs per-view, cond as
# [ref, target] pairs), so splitting the view axis into chunks of diff_bs
# is EXACT — and operationally critical on TPU: a loaded executable
# permanently reserves its temp arena in HBM, so one bounded-size UNet
# program (reused for every chunk and every view-bucket size, no
# recompiles at bucket changes) replaces per-bucket whole-batch programs
# whose arenas crowd out the mesh-phase rasterizer.
# ---------------------------------------------------------------------------

def _pad_rows(x, n):
    return x if n == 0 else jnp.concatenate(
        [x, jnp.repeat(x[-1:], n, axis=0)], axis=0)


def _take_views(x, N, i, b):
    """Rows i:i+b of a per-view (N, ...) array, padded up to b."""
    sl = x[i:min(i + b, N)]
    return _pad_rows(sl, b - sl.shape[0])


def _take_cfg(x, N, i, b):
    """(2N, ...) CFG batch [uncond; cond] -> (2b, ...) chunk."""
    return jnp.concatenate(
        [_take_views(x[:N], N, i, b), _take_views(x[N:], N, i, b)], axis=0)


def _take_pairs(x, N, i, b):
    """(2N, ...) pair-interleaved [r0,t0,r1,t1,...] -> (2b, ...) chunk."""
    y = x.reshape(N, 2, *x.shape[1:])
    return _take_views(y, N, i, b).reshape(2 * b, *x.shape[1:])


def _cat_views(chunks, N):
    return jnp.concatenate(chunks, axis=0)[:N]


def _cat_cfg(chunks, N, b):
    u = jnp.concatenate([c[:b] for c in chunks], axis=0)[:N]
    c_ = jnp.concatenate([c[b:] for c in chunks], axis=0)[:N]
    return jnp.concatenate([u, c_], axis=0)


def _cat_pairs(chunks, N):
    out = jnp.concatenate(
        [c.reshape(-1, 2, *c.shape[1:]) for c in chunks], axis=0)[:N]
    return out.reshape(2 * N, *out.shape[2:])


def _tree(fn, tree):
    return None if tree is None else jax.tree_util.tree_map(fn, tree)


def _tree_cat(fn_cat, chunk_trees):
    if chunk_trees[0] is None:
        return None
    return jax.tree_util.tree_map(lambda *xs: fn_cat(list(xs)), *chunk_trees)


def chunk_view_batches(fn, diff_bs):
    """Wrap fn(params, x) so x's leading (view) axis is processed diff_bs
    rows per call; remainders are padded up to one chunk so exactly one
    executable per chunk shape exists (used for the 512^2 VAE passes)."""
    b = int(diff_bs)

    def run(params, x):
        n = x.shape[0]
        if b <= 0 or n <= b:
            return fn(params, x)
        outs = [fn(params, x[i:i + b]) for i in range(0, (n // b) * b, b)]
        r = n % b
        if r:
            outs.append(fn(params, _pad_rows(x[n - r:], b - r))[:r])
        return jnp.concatenate(outs, axis=0)
    return run


def make_chunked_noise_pred_1pass(models: DenoiseModels, diff_bs: int):
    """1-pass noise pred with the view axis processed diff_bs at a time.

    Exact only in use_reference mode (chunking would break all-view joint
    attention); falls through to the whole-batch path otherwise.
    """
    full = make_noise_pred_1pass(models)
    b = int(diff_bs)

    def noise_pred(unet_params, cn_params, latents, t, embeds, cond_images,
                   cn_scales, guidance_scale, ip_context=None,
                   ref_noisy=None):
        N = latents.shape[0] // 2
        if ref_noisy is None or not models.use_reference or N <= b:
            return full(unet_params, cn_params, latents, t, embeds,
                        cond_images, cn_scales, guidance_scale,
                        ip_context=ip_context, ref_noisy=ref_noisy)
        outs = []
        for i in range(0, N, b):
            outs.append(full(
                unet_params, cn_params, _take_cfg(latents, N, i, b),
                _take_cfg(t, N, i, b), _take_cfg(embeds, N, i, b),
                [_take_cfg(ci, N, i, b) for ci in cond_images], cn_scales,
                guidance_scale,
                ip_context=None if ip_context is None
                else _take_cfg(ip_context, N, i, b),
                ref_noisy=_take_views(ref_noisy, N, i, b)))
        return _cat_views(outs, N)

    return noise_pred


def make_chunked_noise_pred_2pass(models: DenoiseModels, diff_bs: int):
    """(p1, p2) with the view axis processed diff_bs at a time.

    Chunk outputs are reassembled into the same canonical layouts the
    whole-batch functions produce — eps (N, ...), enc_state
    (per-view tree, pair-interleaved tree), p1_residuals (2N CFG trees) —
    so p1/p2 remain drop-in interchangeable with the unchunked pair.
    Exact only in use_reference mode; falls through otherwise.
    """
    p1_full, p2_full = make_noise_pred_2pass(models)
    b = int(diff_bs)

    def p1(unet_params, cn_params, latents, t, embeds, depth_images,
           depth_scale, guidance_scale, ip_context=None,
           extra_images=(), extra_scales=(), ref_noisy=None):
        N = latents.shape[0] // 2
        if ref_noisy is None or not models.use_reference or N <= b:
            return p1_full(unet_params, cn_params, latents, t, embeds,
                           depth_images, depth_scale, guidance_scale,
                           ip_context=ip_context, extra_images=extra_images,
                           extra_scales=extra_scales, ref_noisy=ref_noisy)
        eps_ch, enc_u_ch, enc_c_ch, downs_ch, mid_ch = [], [], [], [], []
        for i in range(0, N, b):
            eps_i, (enc_u, enc_c), (downs, mid) = p1_full(
                unet_params, cn_params, _take_cfg(latents, N, i, b),
                _take_cfg(t, N, i, b), _take_cfg(embeds, N, i, b),
                None if depth_images is None
                else _take_cfg(depth_images, N, i, b),
                depth_scale, guidance_scale,
                ip_context=None if ip_context is None
                else _take_cfg(ip_context, N, i, b),
                extra_images=tuple(_take_cfg(e, N, i, b)
                                   for e in extra_images),
                extra_scales=extra_scales,
                ref_noisy=_take_views(ref_noisy, N, i, b))
            eps_ch.append(eps_i)
            enc_u_ch.append(enc_u)
            enc_c_ch.append(enc_c)
            downs_ch.append(downs)
            mid_ch.append(mid)
        eps = _cat_views(eps_ch, N)
        enc_state = (_tree_cat(lambda xs: _cat_views(xs, N), enc_u_ch),
                     _tree_cat(lambda xs: _cat_pairs(xs, N), enc_c_ch))
        p1_res = (_tree_cat(lambda xs: _cat_cfg(xs, N, b), downs_ch),
                  _tree_cat(lambda xs: _cat_cfg(xs, N, b), mid_ch))
        return eps, enc_state, p1_res

    def p2(unet_params, cn_params, latents, enc_state, p1_residuals, t,
           embeds, tile_images, depth_images, tile_scale, depth_scale,
           guidance_scale, ip_context=None, ref_noisy=None):
        N = latents.shape[0] // 2
        if ref_noisy is None or not models.use_reference or N <= b:
            return p2_full(unet_params, cn_params, latents, enc_state,
                           p1_residuals, t, embeds, tile_images,
                           depth_images, tile_scale, depth_scale,
                           guidance_scale, ip_context=ip_context,
                           ref_noisy=ref_noisy)
        enc_u, enc_c = enc_state
        downs, mid = p1_residuals
        outs = []
        for i in range(0, N, b):
            enc_i = (_tree(lambda x: _take_views(x, N, i, b), enc_u),
                     _tree(lambda x: _take_pairs(x, N, i, b), enc_c))
            res_i = (_tree(lambda x: _take_cfg(x, N, i, b), downs),
                     _tree(lambda x: _take_cfg(x, N, i, b), mid))
            outs.append(p2_full(
                unet_params, cn_params, _take_cfg(latents, N, i, b),
                enc_i, res_i, _take_cfg(t, N, i, b),
                _take_cfg(embeds, N, i, b),
                _take_cfg(tile_images, N, i, b),
                None if depth_images is None
                else _take_cfg(depth_images, N, i, b),
                tile_scale, depth_scale, guidance_scale,
                ip_context=None if ip_context is None
                else _take_cfg(ip_context, N, i, b),
                ref_noisy=_take_views(ref_noisy, N, i, b)))
        return _cat_views(outs, N)

    return p1, p2
