"""SSDNeRF paper preset: cars3v_recons1v — 1-view reconstruction with a
model trained from 3 views per scene (ref
configs/paper_cfgs/ssdnerf_cars3v_recons1v.py)."""
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
    num_train_imgs=3,
    recons_views=1,
)


def build_denoiser(key):
    return build_denoiser_for(ssdnerf_config, key)
