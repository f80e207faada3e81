"""SSDNeRF cars_recons1v with a 16-bit scene-code cache (ref
configs/new_cfgs/ssdnerf_cars_recons1v_16bit.py: cache_16bit=True halves
host RAM for the 2458-scene code cache). Host cache dtype only — device
math stays fp32."""
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
    single_view_recons=True,
    cache_dtype="float16",
)


def build_denoiser(key):
    return build_denoiser_for(ssdnerf_config, key)
