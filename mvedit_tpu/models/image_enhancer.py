"""SRVGGNetCompact x4 super-resolution ("image_enhancer").

Rebuilds `lib/models/decoders/image_space_ss.py:8` (Real-ESRGAN compact VGG
net): conv stack with PReLU + pixel-shuffle x4 upsampler + nearest-residual.
Used to upsample <512 renders before ControlNet-tile
(mvedit_3d_pipeline.py:213,273,1400); weights from
`realesr-general-x4v3.pth` convert via `convert_srvgg`.
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["SRVGGNetCompact", "convert_srvgg"]


class SRVGGNetCompact(nn.Module):
    num_feat: int = 64
    num_conv: int = 32
    upscale: int = 4

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [0,1] -> (B, 4H, 4W, 3)."""
        B, H, W, _ = x.shape
        h = nn.Conv(self.num_feat, (3, 3), padding=1, name="body_0")(x)
        a = self.param("prelu_0", nn.initializers.constant(0.25),
                       (self.num_feat,))
        h = jnp.where(h >= 0, h, a * h)
        for i in range(self.num_conv):
            h = nn.Conv(self.num_feat, (3, 3), padding=1,
                        name=f"body_{2 * i + 2}")(h)
            a = self.param(f"prelu_{i + 1}", nn.initializers.constant(0.25),
                           (self.num_feat,))
            h = jnp.where(h >= 0, h, a * h)
        h = nn.Conv(3 * self.upscale ** 2, (3, 3), padding=1,
                    name="conv_up")(h)
        # pixel shuffle
        r = self.upscale
        h = h.reshape(B, H, W, r, r, 3)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * r, W * r, 3)
        base = jax.image.resize(x, (B, H * r, W * r, 3), "nearest")
        return h + base


def convert_srvgg(sd):
    """Map realesr-general state_dict (body.N.{weight,bias}) to params."""
    flat = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k.startswith("body."):
            i = int(k.split(".")[1])
            if v.ndim == 4:  # conv OIHW
                flat.setdefault(f"body_{i}", {})["kernel"] = \
                    v.transpose(2, 3, 1, 0)
            elif v.ndim == 1 and k.endswith("bias"):
                flat.setdefault(f"body_{i}", {})["bias"] = v
            else:  # PReLU weight
                flat[f"prelu_{i // 2}"] = v
        elif k.startswith("upsampler") or "conv_up" in k:
            if v.ndim == 4:
                flat.setdefault("conv_up", {})["kernel"] = \
                    v.transpose(2, 3, 1, 0)
            else:
                flat.setdefault("conv_up", {})["bias"] = v
    return flat
