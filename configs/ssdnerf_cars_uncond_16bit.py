"""SSDNeRF cars_uncond with a 16-bit scene-code cache (ref
configs/new_cfgs/ssdnerf_cars_uncond_16bit.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _ssdnerf_paper_base import make_paper_config, build_denoiser_for

ssdnerf_config = make_paper_config()

train_config = dict(
    batch_size=8,
    max_iters=1000000,
    log_interval=50,
    ckpt_interval=2000,
    dataset="cars",
    single_view_recons=False,
    cache_dtype="float16",
)


def build_denoiser(key):
    return build_denoiser_for(ssdnerf_config, key)
