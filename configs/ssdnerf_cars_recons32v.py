"""SSDNeRF paper preset: cars_recons32v — 32-view reconstruction eval
(ref configs/paper_cfgs/multiview_recons/ssdnerf_cars_recons32v.py:
same model as cars_recons1v, val conditions on 32 observed views)."""
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
    recons_views=32,
)


def build_denoiser(key):
    return build_denoiser_for(ssdnerf_config, key)
