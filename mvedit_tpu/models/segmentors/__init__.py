from .efficientnet import EfficientEncoderB7
from .tracer import TracerDecoder, tracer_segment
from .sam import (SamModel, SAMConfig, SAM_VIT_H, SAM_TINY, convert_sam,
                  sam_predict_box)

__all__ = ["EfficientEncoderB7", "TracerDecoder", "tracer_segment",
           "SamModel", "SAMConfig", "SAM_VIT_H", "SAM_TINY", "convert_sam",
           "sam_predict_box"]
