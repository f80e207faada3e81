from .sharded import (make_mesh, make_sharded_denoise_step,
                      make_sharded_nerf_step, dryrun, dryrun_pipeline)

__all__ = ["make_mesh", "make_sharded_denoise_step",
           "make_sharded_nerf_step", "dryrun", "dryrun_pipeline"]
