from .sharded import (make_mesh, make_sharded_denoise_step,
                      make_sharded_nerf_step, dryrun)

__all__ = ["make_mesh", "make_sharded_denoise_step",
           "make_sharded_nerf_step", "dryrun"]
