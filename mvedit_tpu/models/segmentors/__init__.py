from .efficientnet import EfficientEncoderB7
from .tracer import TracerDecoder, tracer_segment

__all__ = ["EfficientEncoderB7", "TracerDecoder", "tracer_segment"]
