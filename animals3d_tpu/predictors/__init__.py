from animals3d_tpu.predictors.config import (
    ArticulationConfig, BasePredictorConfig, DeformConfig, DINOConfig,
    InstancePredictorConfig, LightingConfig, PoseConfig, ShapeConfig,
    TextureConfig, ViTEncoderConfig,
)
from animals3d_tpu.predictors.base import BasePredictor
from animals3d_tpu.predictors.instance import InstancePredictor
