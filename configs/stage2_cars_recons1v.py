"""Stage-2 preset (ref configs/paper_cfgs/stage2_cars_recons1v.py): resume
from a stage-1 scene-code cache (scene_cache.npz in --work-dir) and train
the diffusion prior on top."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _ssdnerf_paper_base import make_paper_config, build_denoiser_for

ssdnerf_config = make_paper_config()

train_config = dict(
    batch_size=8,
    max_iters=80000,
    log_interval=50,
    ckpt_interval=2000,
    dataset="cars",
    init_scene_cache="scene_cache.npz",
)


def build_denoiser(key):
    return build_denoiser_for(ssdnerf_config, key)
