from txr.ops.backproject import (
    backproject,
    backproject_batch,
    backproject_world,
    transform_to_world,
)
from txr.ops.voxel import voxel_downsample
from txr.ops.outlier import knn_mean_distance, remove_statistical_outliers

__all__ = [
    "backproject",
    "backproject_batch",
    "backproject_world",
    "transform_to_world",
    "voxel_downsample",
    "knn_mean_distance",
    "remove_statistical_outliers",
]
