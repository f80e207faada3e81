"""Stage-1 auto-decoder with a 16-bit scene-code cache (ref
configs/new_cfgs/stage1_cars_recons16v_16bit.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _ssdnerf_paper_base import make_paper_config

ssdnerf_config = make_paper_config()

train_config = dict(
    batch_size=8,
    max_iters=40000,
    log_interval=50,
    ckpt_interval=2000,
    dataset="cars",
    recons_views=16,
    no_diffusion=True,
    cache_dtype="float16",
)


def build_denoiser(key):
    return None, None, None  # stage 1 trains no denoiser
