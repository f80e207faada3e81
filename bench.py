"""Driver benchmark: 6-view UNet denoise throughput (the headline metric).

Measures one CFG denoise step of the multiview SD1.5 UNet — batch 12
(6 views x 2 for classifier-free guidance) at 64x64 latents (512^2 images)
with cross-image joint self-attention over the 6 views, exactly the hot loop
of the reference's MVEdit pipelines (`lib/pipelines/adapter3d_mixin.py:68-135`
driven with --diff-bs at `app.py:36`; the reference runs 2N CFG UNet passes
per denoise step on an A100).

Also measures the FULL per-timestep diffusion cost of the 2-pass MVEdit
loop — p1 (enc+dec) + VAE decode + tile/depth ControlNets + p2 (dec) + VAE
encode — reported as extra keys so the headline stays comparable across
rounds while the pipeline cost is on record.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp

# persistent jit cache: repeated bench invocations skip the ~2-4 min
# UNet/VAE compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# Derived A100 anchor for the production run_3d_to_3d schedule — a MODELED
# number, not a measurement (no GPU in this environment); derivation and
# unit-cost assumptions in BASELINE.md "Derived A100 end-to-end anchor".
A100_E2E_MODELED_S = 168.0


def _timeit(fn, *args, n=10, retries=3):
    """Time fn with a scalar-readback barrier, retrying transient tunnel
    failures.

    NOTE: block_until_ready does not synchronize through the axon tunnel;
    a scalar readback is the only honest timing barrier here. The tunnel
    occasionally drops a request mid-read (`remote_compile: read body
    closed` — this exact failure nulled the round-4 driver record), so
    every measurement retries with backoff instead of taking the whole
    bench down. Raises only after `retries` consecutive failures; callers
    additionally guard each section (see _section) so one dead measurement
    still leaves a JSON line with the other fields populated.
    """
    def run():
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))

    last = None
    for attempt in range(retries):
        try:
            run()  # warmup (compile/cache-load) — also absorbs retries
            t0 = time.perf_counter()
            for _ in range(n):
                run()
            return (time.perf_counter() - t0) / n
        except Exception as e:  # transient tunnel/runtime error: back off
            last = e
            import sys
            print(f"bench: measurement failed (attempt {attempt + 1}/"
                  f"{retries}): {e}", file=sys.stderr)
            time.sleep(2.0 * (attempt + 1))
    raise last


def _section(rec, errors, name, fn):
    """Run one measurement section; on failure record null + the error
    instead of crashing the bench (the round's only driver artifact)."""
    try:
        fn()
    except Exception as e:
        import sys
        import traceback
        traceback.print_exc(file=sys.stderr)
        errors[name] = f"{type(e).__name__}: {e}"
        rec.setdefault("errors", errors)


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def main():
    # rec is built up section by section; every section is crash-guarded
    # (_section) and the JSON line prints no matter what — a null field
    # plus rec["errors"] beats the rc=1 that nulled round 4's record.
    rec = {
        "metric": "6-view UNet CFG denoise steps/sec (512^2, joint attn)",
        "value": None,
        "unit": "steps/s",
        "vs_baseline": None,
    }
    errors = {}
    try:
        _main_measurements(rec, errors)
    except Exception as e:
        import sys
        import traceback
        traceback.print_exc(file=sys.stderr)
        errors["setup"] = f"{type(e).__name__}: {e}"
        rec["errors"] = errors
    _attach_e2e_records(rec)
    print(json.dumps(rec))


def _attach_e2e_records(rec):
    """Carry the last recorded end-to-end runs (bench.py --e2e[,
    --superres], real full-scale pipeline with phase breakdown) alongside
    the headline, plus the derived A100 ratio and the modeled 8-chip
    projection."""
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    e2e_path = os.path.join(here, "E2E_RECORD.json")
    if os.path.exists(e2e_path):
        with open(e2e_path) as fh:
            e2e = json.load(fh)
        rec["e2e_s"] = e2e.get("value")
        rec["e2e_phases_s"] = e2e.get("phases_s")
        rec["e2e_unit_costs_s"] = e2e.get("unit_costs_s")
        rec["e2e_unit_costs_steady_s"] = e2e.get("unit_costs_steady_s")
        rec["e2e_production_schedule_modeled_s"] = e2e.get(
            "e2e_production_schedule_modeled_s")
        rec["e2e_production_schedule_modeled_steady_s"] = e2e.get(
            "e2e_production_schedule_modeled_steady_s")
        rec["e2e_reduced_schedule"] = e2e.get("reduced_schedule")
        # derived A100 anchor (BASELINE.md "Derived A100 end-to-end
        # anchor", MODELED): speedup ratio vs the modeled A100 run of the
        # same production schedule; >= 3.0 on v5e-8 is the north star
        steady = rec.get("e2e_production_schedule_modeled_steady_s")
        if steady:
            rec["e2e_vs_a100_modeled"] = round(
                A100_E2E_MODELED_S / steady, 4)
        # modeled 8-chip projection (written by --e2e when the sharded
        # phase units are known): the v5e-8 figure the 3x target is
        # scored against
        for k in ("e2e_production_modeled_8chip_s",
                  "e2e_vs_a100_modeled_8chip"):
            if e2e.get(k) is not None:
                rec[k] = e2e[k]
    sr_path = os.path.join(here, "E2E_SR_RECORD.json")
    if os.path.exists(sr_path):
        with open(sr_path) as fh:
            sr = json.load(fh)
        rec["superres_production_modeled_s"] = sr.get(
            "superres_production_modeled_s")
        rec["superres_production_modeled_steady_s"] = sr.get(
            "superres_production_modeled_steady_s")


def _main_measurements(rec, errors):
    from mvedit_tpu.models.diffusion import (UNet2DCondition, SD15_UNET,
                                             AutoencoderKL, SD_VAE,
                                             ControlNet, AttnMode)
    net = UNet2DCondition(SD15_UNET)
    B = 12  # 6 views x CFG
    # random (not zero) inputs: TPU timing is data-independent, but random
    # data removes any doubt about sparsity/flush shortcuts in the record
    kx, kc = jax.random.split(jax.random.PRNGKey(42))
    x = jax.random.normal(kx, (B, 64, 64, 4), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jax.random.normal(kc, (B, 77, 768), jnp.float32)
    params = jax.jit(lambda k: net.init(k, x[:1], t[:1], ctx[:1]))(
        jax.random.PRNGKey(0))
    # inference params ride in bf16 (as the runner stores them): halves
    # the weight streaming of every conv/matmul
    params = _bf16(params)
    jax.block_until_ready(params)

    mode = AttnMode(num_views=6)

    @jax.jit
    def denoise_step(p, lat, t, c):
        # one full CFG denoise forward (uncond+cond batched together)
        eps = net.apply(p, lat, t, c, mode=mode)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        return eps_u + 7.5 * (eps_c - eps_u)

    # BENCH_r01.json recorded 3.3246 steps/s on this exact metric; report
    # the ratio so the driver's record is self-describing across rounds.
    R1_STEPS_PER_S = 3.3246

    def _headline():
        dt = _timeit(denoise_step, params, x, t, ctx)
        rec["value"] = round(1.0 / dt, 4)
        rec["vs_baseline"] = round(1.0 / dt / R1_STEPS_PER_S, 4)
    _section(rec, errors, "headline", _headline)

    # ---- production-default conditioning: reference pairs --------------
    # (DenoiseModels.use_reference, the reference's get_noise_pred
    # :86-127 — uncond runs per-view, cond as [ref, target] pairs; ~2.4x
    # less attention work than 6-view joint attention)
    @jax.jit
    def denoise_step_refpair(p, lat6, ref6, t6, c6):
        eps_u = net.apply(p, lat6, t6, c6, mode=AttnMode())
        pair = jnp.stack([ref6, lat6], 1).reshape(12, 64, 64, 4)
        eps_pair = net.apply(p, pair, jnp.repeat(t6, 2, 0),
                             jnp.repeat(c6, 2, 0), mode=AttnMode(num_views=2))
        eps_c = eps_pair.reshape(6, 2, 64, 64, 4)[:, 1]
        return eps_u + 7.5 * (eps_c - eps_u)

    lat6b = jax.random.normal(jax.random.PRNGKey(43), (6, 64, 64, 4))

    def _refpair():
        dt_rp = _timeit(denoise_step_refpair, params, lat6b, lat6b, t[:6],
                        ctx[:6])
        rec["refpair_denoise_steps_per_s"] = round(1.0 / dt_rp, 4)
    _section(rec, errors, "refpair", _refpair)

    # ---- full 2-pass pipeline timestep (denoise side) ------------------
    from mvedit_tpu.pipelines.denoise import (DenoiseModels,
                                              make_noise_pred_2pass)
    vae = AutoencoderKL(SD_VAE)
    vae_params = _bf16(jax.jit(lambda k: vae.init(
        k, jnp.zeros((1, 64, 64, 3))))(jax.random.PRNGKey(1))["params"])
    cns = tuple(ControlNet(SD15_UNET, hint_strides=3) for _ in range(2))
    hint = jax.random.uniform(jax.random.PRNGKey(44), (1, 512, 512, 3))
    cn_params = [
        _bf16(jax.jit(lambda k: cn.init(k, x[:1], t[:1], ctx[:1], hint)
                      )(jax.random.PRNGKey(2 + i))["params"])
        for i, cn in enumerate(cns)]
    jax.block_until_ready(cn_params)
    # production default: reference-pair conditioning (use_reference=True
    # in MVEdit3DConfig/TextureConfig)
    dm = DenoiseModels(unet=net, controlnets=cns, num_views=6,
                       use_reference=True)
    p1, p2 = make_noise_pred_2pass(dm)
    up = params["params"]
    imgs = jax.random.uniform(jax.random.PRNGKey(45), (6, 512, 512, 3))

    @jax.jit
    def vae_dec(p, lat):
        return vae.apply({"params": p}, lat, method=vae.decode)

    @jax.jit
    def vae_enc(p, img):
        return vae.apply({"params": p}, img, method=vae.encode)

    def full_step(lat6):
        lat2 = jnp.concatenate([lat6, lat6], 0)
        eps, enc_state, res = p1(up, cn_params, lat2, t, ctx, None, 0.5,
                                 7.0, ref_noisy=lat6)
        x0 = (lat6 - 0.8 * eps) / 0.6
        dec = vae_dec(vae_params, x0)
        tiles2 = jnp.concatenate([imgs, imgs], 0)
        eps2 = p2(up, cn_params, lat2, enc_state, res, t, ctx, tiles2,
                  tiles2, 1.0, 0.5, 7.0, ref_noisy=lat6)
        lat3d = vae_enc(vae_params, dec)
        return eps2 + 0.1 * lat3d

    lat6 = jax.random.normal(jax.random.PRNGKey(46), (6, 64, 64, 4))

    def _full():
        dt_full = _timeit(full_step, lat6, n=5)
        rec["full_pipeline_denoise_step_s"] = round(dt_full, 4)
        rec["full_pipeline_denoise_steps_per_s"] = round(1.0 / dt_full, 4)
    _section(rec, errors, "full_pipeline", _full)

    # amortized device throughput of the headline step: K chained steps
    # inside ONE jit (lax.fori_loop), so the ~27 ms/roundtrip tunnel
    # dispatch+readback overhead (an artifact of this environment's axon
    # tunnel, not of TPU serving) is paid once instead of per step
    K_AMORT = 10

    @jax.jit
    def denoise_chain(p, lat, t, c):
        def body(_, l):
            eps = net.apply(p, l, t, c, mode=mode)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            g = eps_u + 7.5 * (eps_c - eps_u)
            return jnp.concatenate([g, g], 0) * 0.999
        return jax.lax.fori_loop(0, K_AMORT, body, lat)

    def _amort():
        # headline step amortized inside one jit (no per-step tunnel
        # dispatch overhead): the device's true steady-state throughput
        dt_amort = _timeit(denoise_chain, params, x, t, ctx, n=3) / K_AMORT
        rec["denoise_steps_per_s_amortized"] = round(1.0 / dt_amort, 4)
    _section(rec, errors, "amortized", _amort)


def main_sharded():
    """--sharded: the same CFG denoise step pjit over ALL local devices
    (view axis = 'dp', params replicated). On an N-chip slice the 2N-view
    production batch shards N-per-... prints per-device and aggregate
    steps/s; on one chip it degenerates to the single-device number (run
    it on a pod slice for the scaling figure)."""
    from mvedit_tpu.models.diffusion import (UNet2DCondition, SD15_UNET,
                                             AttnMode)
    from mvedit_tpu.parallel.sharded import (make_mesh,
                                             make_sharded_denoise_step)
    n_dev = len(jax.devices())
    net = UNet2DCondition(SD15_UNET)
    # production image-to-3D scale: 32 views x CFG = 64 images; shard dp
    B = max(8 * n_dev, 16)
    kx, kc = jax.random.split(jax.random.PRNGKey(42))
    x = jax.random.normal(kx, (B, 64, 64, 4), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jax.random.normal(kc, (B, 77, 768), jnp.float32)
    params = jax.jit(lambda k: net.init(k, x[:1], t[:1], ctx[:1]))(
        jax.random.PRNGKey(0))
    params = _bf16(params)
    mesh = make_mesh(n_dev)
    step = make_sharded_denoise_step(net, mesh,
                                     AttnMode(num_views=2), 7.5)
    dt = _timeit(step, params, x, t, ctx, n=5)
    print(json.dumps({
        "metric": f"sharded CFG denoise steps/sec ({n_dev} devices, "
                  f"{B} images, pair attention)",
        "value": round(1.0 / dt, 4),
        "unit": "steps/s",
        "vs_baseline": None,
        "devices": n_dev,
        "images_per_step": B,
        "images_per_s": round(B / dt, 2),
    }))


def main_e2e(steps=6, num_views=16, n_inverse_steps=16,
             init_inverse_steps=64, tet_init_inverse_steps=32,
             superres=False):
    """--e2e: run the REAL full-scale run_3d_to_3d flow (512^2, tet 128,
    random weights, reduced step counts) with a wall-clock phase timer,
    then model the production-schedule e2e from the measured per-unit
    phase costs (BASELINE.md north star: end-to-end image-to-3D
    wall-clock). Writes E2E_RECORD.json so the default bench line can
    carry the numbers."""
    import os
    import numpy as np
    from mvedit_tpu.apis import Adapter3DRunner
    from mvedit_tpu.models.mesh import Mesh
    from mvedit_tpu.models.mesh.dmtet import build_grid_tets, marching_tets
    from mvedit_tpu.utils.profiling import PhaseTimer, set_phase_timer

    # sphere input mesh
    grid = build_grid_tets(16, crop_sphere=False)
    sdf = 0.55 - np.linalg.norm(grid.verts, axis=-1)
    out = marching_tets(grid, jnp.asarray(sdf))
    fm = np.asarray(out["face_mask"])
    f = np.asarray(out["faces"])[fm]
    v = np.asarray(out["verts"])
    used = np.unique(f)
    remap = np.full(len(v), -1, np.int64)
    remap[used] = np.arange(len(used))
    mesh = Mesh(v=v[used].astype(np.float32), f=remap[f].astype(np.int32))
    mesh.auto_normal()
    src = "/tmp/bench_e2e_sphere.glb"
    mesh.write_glb(src)

    runner = Adapter3DRunner(tiny_models=False, seed=0)
    pt = PhaseTimer()
    set_phase_timer(pt)
    t0 = time.perf_counter()
    err = None
    out = {}
    # retry once on a transient tunnel failure (the pipeline's jit
    # programs are all persistent-cached, so a retry resumes fast); if the
    # retry also dies, record the partial phase table + error instead of
    # exiting rc=1
    for attempt in range(2):
        try:
            out = runner.run_3d_to_3d(
                src, "a colorful sphere", seed=1, steps=steps,
                num_views=num_views, n_inverse_steps=n_inverse_steps,
                init_inverse_steps=init_inverse_steps,
                tet_init_inverse_steps=tet_init_inverse_steps,
                estimate_pose=False,
                # chained texture superres (part of every reference
                # product path, adapter3d.py:848-857): reduced diffusion
                # steps, but the 512-step texture fit and 2048^2 bake run
                # at production scale
                superres={"steps": 6} if superres else False)
            err = None
            break
        except Exception as e:
            import sys
            import traceback
            traceback.print_exc(file=sys.stderr)
            err = f"{type(e).__name__}: {e}"
            time.sleep(5.0)
    wall = time.perf_counter() - t0
    set_phase_timer(None)
    phases = pt.report()

    # model the production schedule from measured per-unit costs
    # (production: 24 steps, switch 0.6 -> ~15 nerf / ~10 mesh timesteps,
    # 80 inner steps each, init 256, tet init 120)
    n_nerf_ts = max(pt.counts.get("nerf_fit", 1) - 1, 1)
    nerf_unit = pt.totals.get("nerf_fit", 0.0) / max(
        init_inverse_steps + n_nerf_ts * n_inverse_steps, 1)
    n_mesh_ts = max(pt.counts.get("mesh_fit", 1) - 1, 0)
    mesh_unit = pt.totals.get("mesh_fit", 0.0) / max(
        tet_init_inverse_steps + n_mesh_ts * n_inverse_steps, 1)
    den_unit = (pt.totals.get("denoise_p1+vae_dec", 0.0)
                + pt.totals.get("denoise_p2+vae_enc+solver", 0.0)) / max(
        pt.counts.get("denoise_p1+vae_dec", 1), 1)
    render_unit = pt.totals.get("render_all", 0.0) / max(
        pt.counts.get("render_all", 1), 1)
    e2e_model = (256 * nerf_unit + 15 * 80 * nerf_unit
                 + 120 * mesh_unit + 9 * 80 * mesh_unit
                 + 24 * den_unit + 25 * render_unit
                 + phases.get("bake", 0.0))

    # compile-excluded (steady-state) unit costs: the wall-amortized units
    # above fold first-call XLA compiles into the per-step cost (e.g. mesh
    # fit 7.0 "s/step" wall vs ~1.6 s measured steady). The steady model is
    # the production number once the persistent compile cache is warm.
    def _st(name, per):
        s = pt.steady(name)
        return (s / per) if s is not None else None
    nerf_st = _st("nerf_fit", n_inverse_steps) or nerf_unit
    mesh_st = _st("mesh_fit", n_inverse_steps) or mesh_unit
    # fall back to the wall-amortized unit unless BOTH denoise phases
    # produced a steady median — using one alone would silently drop half
    # the denoise cost from the modeled steady-state figure
    _den_p1 = pt.steady("denoise_p1+vae_dec")
    _den_p2 = pt.steady("denoise_p2+vae_enc+solver")
    den_st = (_den_p1 + _den_p2) if (
        _den_p1 is not None and _den_p2 is not None) else den_unit
    render_st = pt.steady("render_all") or render_unit
    e2e_model_steady = (256 * nerf_st + 15 * 80 * nerf_st
                        + 120 * mesh_st + 9 * 80 * mesh_st
                        + 24 * den_st + 25 * render_st
                        + phases.get("bake", 0.0))
    # ---- modeled 8-chip (v5e-8) projection --------------------------
    # Amdahl split per phase: the fraction of each steady unit that
    # shards over 'dp' under the WIRED sharding paths (denoise view axis,
    # nerf ray axis, mesh pixel-row/face-sample constraint-SPMD,
    # render_all view axis). Fractions derive from the r5 on-chip
    # attribution (PERF.md r5 table):
    # - mesh_fit: render+shading 383 ms + losses/regs ~50 of 645 -> 0.67
    #   (replicated: verts-lerp 32, bin/candidate machinery partially,
    #   Adam/sample/scan ~160)
    # - nerf_fit: ray-sharded encode/decode fwd+bwd + losses ~0.85 (the
    #   r3 fold table: encode fwd+bwd 177 of 239; Adam/occupancy repl.)
    # - denoise: 32-view CFG batch = 64 images -> 8/chip; solver/scalar
    #   ops replicated -> 0.95
    # - render_all: embarrassingly view-parallel -> 0.95; bake: 1 chip
    SHARD_FRAC = {"nerf_fit": 0.85, "mesh_fit": 0.67,
                  "denoise": 0.95, "render_all": 0.95}

    def _chip8(unit, phase):
        f = SHARD_FRAC[phase]
        return unit * (f / 8.0 + (1.0 - f))

    e2e_model_8chip = (256 * _chip8(nerf_st, "nerf_fit")
                       + 15 * 80 * _chip8(nerf_st, "nerf_fit")
                       + 120 * _chip8(mesh_st, "mesh_fit")
                       + 9 * 80 * _chip8(mesh_st, "mesh_fit")
                       + 24 * _chip8(den_st, "denoise")
                       + 25 * _chip8(render_st, "render_all")
                       + phases.get("bake", 0.0))

    rec = {
        "metric": "e2e 3d-to-3d wall clock (reduced steps, 512^2, tet 128)",
        "value": round(wall, 2),
        "unit": "s",
        "vs_baseline": None,
        "phases_s": phases,
        # wall minus timed pipeline phases: model init (random-weight SD
        # stack built on the single host core in this env — real
        # checkpoints stream in far faster), aux-net loads, GLB preproc,
        # jit tracing + persistent-cache deserialization
        "non_phase_overhead_s": round(wall - sum(phases.values()), 1),
        "reduced_schedule": {
            "steps": steps, "num_views": num_views,
            "n_inverse_steps": n_inverse_steps,
            "init_inverse_steps": init_inverse_steps,
            "tet_init_inverse_steps": tet_init_inverse_steps},
        "unit_costs_s": {
            "nerf_fit_step": round(nerf_unit, 4),
            "mesh_fit_step": round(mesh_unit, 4),
            "denoise_timestep": round(den_unit, 3),
            "render_all": round(render_unit, 3)},
        "unit_costs_steady_s": {
            "nerf_fit_step": round(nerf_st, 4),
            "mesh_fit_step": round(mesh_st, 4),
            "denoise_timestep": round(den_st, 3),
            "render_all": round(render_st, 3)},
        # per-call wall durations per phase (call order): makes the
        # compile-vs-steady split auditable from the artifact — e.g.
        # render_all's calls each carry a DIFFERENT (mode, rs, N)
        # signature early in a run, so every one may include an XLA
        # compile; the median alone can't show that
        "phase_durations_s": {
            k: [round(x, 2) for x in v]
            for k, v in sorted(pt.durations.items())},
        "e2e_production_schedule_modeled_s": round(e2e_model, 1),
        "e2e_production_schedule_modeled_steady_s": round(
            e2e_model_steady, 1),
        # speedup vs the modeled A100 anchor (BASELINE.md; >=3.0 on v5e-8
        # is the north star; single-chip reads below 1)
        "e2e_vs_a100_modeled": round(A100_E2E_MODELED_S / e2e_model_steady,
                                     4) if e2e_model_steady else None,
        # the v5e-8 figure the >=3x north star is scored against: steady
        # units under the wired sharding paths, Amdahl-split per phase
        # (fractions + derivation above; MODELED — no 8-chip slice here)
        "e2e_production_modeled_8chip_s": round(e2e_model_8chip, 1),
        "e2e_vs_a100_modeled_8chip": round(
            A100_E2E_MODELED_S / e2e_model_8chip, 4)
        if e2e_model_8chip else None,
        "shard_fractions": SHARD_FRAC,
        "mesh_ok": out.get("mesh") is not None,
    }
    if err is not None:
        rec["error"] = err
    if superres:
        # superres phase record + production model: ~10 effective denoise
        # steps (24 x strength 0.4); the tex fit (512 steps) and 2048^2
        # bake already ran at production scale
        sr_den = pt.totals.get("superres_denoise", 0.0)
        sr_den_n = max(pt.counts.get("superres_denoise", 1), 1)
        sr_unit = sr_den / sr_den_n
        sr_unit_st = pt.steady("superres_denoise") or sr_unit
        sr_rest = (phases.get("superres_tex_fit", 0.0)
                   + phases.get("superres_bake", 0.0))
        rec["superres_phases_s"] = {
            k: phases[k] for k in ("superres_denoise", "superres_tex_fit",
                                   "superres_bake") if k in phases}
        rec["superres_denoise_step_s"] = round(sr_unit, 3)
        rec["superres_production_modeled_s"] = round(
            10 * sr_unit + sr_rest, 1)
        rec["superres_production_modeled_steady_s"] = round(
            10 * sr_unit_st + sr_rest, 1)
    print(json.dumps(rec))
    fname = "E2E_SR_RECORD.json" if superres else "E2E_RECORD.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           fname), "w") as fh:
        json.dump(rec, fh, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sharded", action="store_true",
                    help="pjit the denoise step over all local devices")
    ap.add_argument("--e2e", action="store_true",
                    help="reduced-step full-scale end-to-end run with "
                         "phase breakdown")
    ap.add_argument("--superres", action="store_true",
                    help="with --e2e: chain the texture superres stage "
                         "and record its phase costs")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax profiler trace of the run")
    args = ap.parse_args()
    if args.e2e:
        run = lambda: main_e2e(superres=args.superres)  # noqa: E731
    else:
        run = main_sharded if args.sharded else main
    try:
        if args.profile:
            from mvedit_tpu.utils.profiling import trace
            with trace(args.profile):
                run()
        else:
            run()
    except Exception as e:  # last-resort guard: NEVER exit rc=1 without
        # a JSON line — round 4's official record was nulled by exactly
        # that (one tunnel read died and nothing caught it)
        import sys
        import traceback
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "6-view UNet CFG denoise steps/sec "
                      "(512^2, joint attn)",
            "value": None, "unit": "steps/s", "vs_baseline": None,
            "errors": {"fatal": f"{type(e).__name__}: {e}"}}))
