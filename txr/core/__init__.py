from txr.core.intrinsics import CameraIntrinsics
from txr.core.config import ReconstructionConfig, StreamingConfig
from txr.core.types import PointSet, concatenate

__all__ = [
    "CameraIntrinsics",
    "ReconstructionConfig",
    "StreamingConfig",
    "PointSet",
    "concatenate",
]
