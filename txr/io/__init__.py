from txr.io.ply import write_ply, read_ply
from txr.io.depth_io import (
    load_depth,
    find_matching_depth,
    save_depth_npy,
    save_depth_png16,
    save_depth_vis,
    depth_to_colormap,
    get_colormap,
)
from txr.io.sources import (
    ImageSource,
    FolderSource,
    VideoSource,
    CameraSource,
    PrefetchSource,
    make_source,
)

__all__ = [
    "write_ply",
    "read_ply",
    "load_depth",
    "find_matching_depth",
    "save_depth_npy",
    "save_depth_png16",
    "save_depth_vis",
    "depth_to_colormap",
    "get_colormap",
    "ImageSource",
    "FolderSource",
    "VideoSource",
    "CameraSource",
    "PrefetchSource",
    "make_source",
]
