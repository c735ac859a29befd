"""Streaming depth-inference pipeline (depth_processor parity).

Behavioral rebuild of the reference's DepthProcessor
(depth_processor.py:795-964): iterate a frame source, run depth inference,
write raw .npy + colormapped vis PNG + uint16 millimeter PNG into
depth_images/ visualizations/, back-project to a per-frame camera-space PLY in
pointclouds/, rate-limited ROS2 publishing, FPS log every 10 frames, optional
preview window, KeyboardInterrupt → clean summary.

TPU-first: inference and back-projection run as one jitted program per frame
shape; the frame source prefetches/decodes on a host thread so device compute
overlaps I/O. For offline sources (folder/video) the processor micro-batches
frames through ONE fused jitted program (preprocess → model → upsample →
vmapped back-projection), amortizing per-dispatch overhead and running the
encoder at its batched MXU operating point; per-frame artifacts (npy, PNGs,
per-frame PLYs, ROS2 messages, preview) are emitted identically, in order.
Live camera sources keep batch=1 for latency. `batch_size=1` forces the
frame-sequential reference behavior exactly.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path
from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

import jax.numpy as jnp

from txr.core.intrinsics import CameraIntrinsics
from txr.io.sources import ImageSource
from txr.io.ply import write_ply
from txr.models.depth_anything import DepthAnythingModel
from txr.ops.backproject import backproject

logger = logging.getLogger(__name__)

# Jitted fused-batch programs, shared across DepthProcessor instances (see
# DepthProcessor._fused_batch_fn).
_BATCH_JIT_CACHE: dict = {}


class PointCloudGenerator:
    """Depth → camera-frame colored point cloud
    (reference depth_processor.py:339-450, as a jitted XLA op)."""

    def __init__(self, intrinsics: CameraIntrinsics, downsample_factor: int = 1):
        self.intrinsics = intrinsics
        self.downsample = max(1, int(downsample_factor))

    def generate(self, depth: np.ndarray, bgr: np.ndarray,
                 max_depth: float = 100.0, min_depth: float = 0.1):
        intr = self.intrinsics
        ps = backproject(
            jnp.asarray(depth), jnp.asarray(bgr)[..., ::-1],
            intr.fx, intr.fy, intr.cx, intr.cy,
            min_depth, max_depth, intr.depth_scale, self.downsample,
        )
        return ps.to_numpy()

    @staticmethod
    def save_ply(path: str, points: np.ndarray, colors: Optional[np.ndarray]):
        write_ply(path, points, colors)


class DepthProcessor:
    """Main processor tying source → model → outputs together."""

    def __init__(
        self,
        model: DepthAnythingModel,
        source: ImageSource,
        output_dir: str,
        mode: str = "both",
        enable_ros2: bool = False,
        ros2_freq: float = 10.0,
        ros2_depth_topic: str = "/depth_anything/depth_image",
        ros2_pc_topic: str = "/depth_anything/points",
        ros2_frame_id: str = "camera_depth_optical_frame",
        pointcloud_downsample: int = 1,
        max_depth: float = 100.0,
        min_depth: float = 0.1,
        colormap: int = 2,  # cv2.COLORMAP_JET
        save_raw_depth: bool = True,
        batch_size: Optional[int] = None,  # None/0 = auto (8 offline, 1 live)
    ):
        self.model = model
        self.source = source
        self.output_dir = Path(output_dir)
        self.mode = mode
        self.max_depth = max_depth
        self.min_depth = min_depth
        self.colormap = colormap
        self.save_raw_depth = save_raw_depth

        self.depth_dir = self.output_dir / "depth_images"
        self.pc_dir = self.output_dir / "pointclouds"
        self.vis_dir = self.output_dir / "visualizations"
        if mode in ("images", "both"):
            self.depth_dir.mkdir(parents=True, exist_ok=True)
            self.vis_dir.mkdir(parents=True, exist_ok=True)
        if mode in ("pointcloud", "both"):
            self.pc_dir.mkdir(parents=True, exist_ok=True)

        self.pc_generator = PointCloudGenerator(
            source.intrinsics, downsample_factor=pointcloud_downsample)
        self.batch_size = batch_size

        self.ros2_node = None
        if enable_ros2:
            from txr.ros2.publisher import ROS2DepthPublisher, ros2_available

            if not ros2_available():
                raise RuntimeError("ROS2 requested but rclpy is not available")
            self.ros2_node = ROS2DepthPublisher(
                publish_depth=mode in ("images", "both"),
                publish_pointcloud=mode in ("pointcloud", "both"),
                publish_rate=ros2_freq,
                depth_topic=ros2_depth_topic,
                pc_topic=ros2_pc_topic,
                frame_id=ros2_frame_id,
            )

    # ------------------------------------------------------------------ run

    def _resolve_batch(self) -> int:
        # The fused batch program needs the real Flax model + params; model
        # stubs/wrappers that only expose infer() run the sequential loop.
        if getattr(self.model, "model", None) is None or \
                getattr(self.model, "params", None) is None:
            return 1
        if self.batch_size:
            return max(1, int(self.batch_size))
        env = os.environ.get("TXR_DEPTH_BATCH")
        if env:
            return max(1, int(env))
        from txr.io.sources import CameraSource, PrefetchSource

        src = self.source
        if isinstance(src, PrefetchSource):
            src = src.inner
        return 1 if isinstance(src, CameraSource) else 8

    def _fused_batch_fn(self, b: int, h: int, w: int):
        """One jitted program for a frame batch: preprocess → model →
        upsample (+ V3 focal scaling) → vmapped back-projection.

        Cached at MODULE level on everything that shapes the program, so a
        second DepthProcessor over the same model/source reuses the jitted
        program instead of re-tracing (the retrace + persistent-cache load
        of a ViT-L program is minutes on the relay and polluted r4's
        config4 bench as unattributed 'host' time)."""
        intr0 = self.source.intrinsics
        key = (id(self.model), b, h, w, self.mode in ("pointcloud", "both"),
               None if intr0 is None else
               (float(intr0.fx), float(intr0.fy), float(intr0.cx),
                float(intr0.cy), float(intr0.depth_scale)),
               float(self.min_depth), float(self.max_depth),
               int(self.pc_generator.downsample))
        if key in _BATCH_JIT_CACHE:
            return _BATCH_JIT_CACHE[key]

        import jax

        from txr.ops.resize import (IMAGENET_MEAN, IMAGENET_STD,
                                    compute_da_resize, resize_bicubic,
                                    resize_bilinear)
        from txr.ops.backproject import backproject_batch

        m = self.model
        model = m.model
        in_h, in_w = compute_da_resize(h, w, m.input_size)
        intr = self.source.intrinsics
        v3s = 1.0
        if m.version == "v3" and intr is not None:
            v3s = (intr.fx + intr.fy) / 2.0 / m.focal_length_ref
        want_pc = self.mode in ("pointcloud", "both")
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        stride = self.pc_generator.downsample

        @jax.jit
        def run(params, bgr_u8):
            rgb = bgr_u8[..., ::-1]
            x = rgb.astype(jnp.float32) / 255.0
            xm = resize_bicubic(x, in_h, in_w, align_corners=False)
            xn = (xm - mean) / std
            depth = model.apply({"params": params}, xn)
            depth = resize_bilinear(depth[..., None], h, w,
                                    align_corners=True)[..., 0] * v3s
            if not want_pc:
                return depth, ()
            ps = backproject_batch(depth, rgb, intr.fx, intr.fy, intr.cx,
                                   intr.cy, self.min_depth, self.max_depth,
                                   intr.depth_scale, stride)
            return depth, (ps.xyz, ps.rgb, ps.mask)

        _BATCH_JIT_CACHE[key] = run
        return run

    def process(self, show_preview: bool = False):
        batch = self._resolve_batch()
        logger.info("Starting processing with mode: %s (batch %d)",
                    self.mode, batch)
        if batch <= 1:
            return self._process_sequential(show_preview)
        return self._process_batched(batch, show_preview)

    def _process_sequential(self, show_preview: bool = False):
        processed = 0
        start = time.time()
        try:
            for image, timestamp, identifier in self.source:
                depth = self.model.infer(image, self.source.intrinsics)

                if self.mode in ("images", "both"):
                    self._save_depth(depth, identifier)

                points = colors = None
                if self.mode in ("pointcloud", "both"):
                    points, colors = self.pc_generator.generate(
                        depth, image, self.max_depth, self.min_depth)
                    self._save_pointcloud(points, colors, identifier)

                self._publish_ros2(depth, points, colors, timestamp)

                if show_preview:
                    self._show_preview(image, depth, identifier)

                processed += 1
                if processed % 10 == 0:
                    fps = processed / (time.time() - start)
                    logger.info("Processed %d frames (%.1f fps)", processed, fps)
        except KeyboardInterrupt:
            logger.info("Processing interrupted by user")
        finally:
            elapsed = max(time.time() - start, 1e-9)
            logger.info("Processed %d frames in %.1fs (%.1f fps)",
                        processed, elapsed, processed / elapsed)
            self.cleanup()
        return processed

    def _process_batched(self, batch: int, show_preview: bool = False):
        processed = 0
        start = time.time()
        it = iter(self.source)
        want_pc = self.mode in ("pointcloud", "both")
        try:
            done = False
            pending = None
            while not done or pending is not None:
                frames = []
                if pending is not None:
                    frames.append(pending)
                    pending = None
                while len(frames) < batch:
                    try:
                        f = next(it)
                    except StopIteration:
                        done = True
                        break
                    # Folder sources may yield mixed sizes (the reference
                    # tolerates them): flush the batch at a shape change.
                    if frames and f[0].shape != frames[0][0].shape:
                        pending = f
                        break
                    frames.append(f)
                if not frames:
                    break
                n = len(frames)
                # Pad short tails by repeating the last frame — keeps ONE
                # compiled program per (batch, H, W) instead of recompiling
                # for every remainder size; padded outputs are dropped.
                images = np.stack([f[0] for f in frames]
                                  + [frames[-1][0]] * (batch - n))
                run = self._fused_batch_fn(batch, images.shape[1],
                                           images.shape[2])
                depths_d, ps_d = run(self.model.params, jnp.asarray(images))
                depths = np.asarray(depths_d, np.float32)
                if want_pc:
                    xyz = np.asarray(ps_d[0], np.float32)
                    rgb = np.asarray(ps_d[1], np.float32)
                    msk = np.asarray(ps_d[2], bool)

                for i in range(n):
                    image, timestamp, identifier = frames[i]
                    depth = depths[i]
                    if self.mode in ("images", "both"):
                        self._save_depth(depth, identifier)
                    points = colors = None
                    if want_pc:
                        points, colors = xyz[i][msk[i]], rgb[i][msk[i]]
                        self._save_pointcloud(points, colors, identifier)
                    self._publish_ros2(depth, points, colors, timestamp)
                    if show_preview:
                        self._show_preview(image, depth, identifier)
                    processed += 1
                    if processed % 10 == 0:
                        fps = processed / (time.time() - start)
                        logger.info("Processed %d frames (%.1f fps)",
                                    processed, fps)
        except KeyboardInterrupt:
            logger.info("Processing interrupted by user")
        finally:
            elapsed = max(time.time() - start, 1e-9)
            logger.info("Processed %d frames in %.1fs (%.1f fps)",
                        processed, elapsed, processed / elapsed)
            self.cleanup()
        return processed

    def _publish_ros2(self, depth, points, colors, timestamp):
        if self.ros2_node is not None and self.ros2_node.should_publish():
            self.ros2_node.publish_camera_info(self.source.intrinsics,
                                               timestamp)
            if self.mode in ("images", "both"):
                self.ros2_node.publish_depth_image(depth, timestamp)
            if self.mode in ("pointcloud", "both") and points is not None:
                self.ros2_node.publish_pointcloud(points, colors, timestamp)
            self.ros2_node.spin_once()

    # ------------------------------------------------------------- outputs

    def _vis_image(self, depth: np.ndarray) -> np.ndarray:
        # Normalize by max_depth — reference behavior (:910-915), not min-max.
        norm = np.clip(depth / self.max_depth, 0, 1)
        return cv2.applyColorMap((norm * 255).astype(np.uint8), self.colormap)

    def _save_depth(self, depth: np.ndarray, identifier: str):
        from txr.io.depth_io import save_depth_npy, save_depth_png16

        if self.save_raw_depth:
            save_depth_npy(str(self.depth_dir / f"{identifier}_depth.npy"),
                           depth)
        cv2.imwrite(str(self.vis_dir / f"{identifier}_depth_vis.png"),
                    self._vis_image(depth))
        save_depth_png16(str(self.depth_dir / f"{identifier}_depth.png"),
                         depth)

    def _save_pointcloud(self, points, colors, identifier: str):
        if points is None or len(points) == 0:
            return
        self.pc_generator.save_ply(str(self.pc_dir / f"{identifier}.ply"),
                                   points, colors)

    def _show_preview(self, image: np.ndarray, depth: np.ndarray, identifier: str):
        vis = self._vis_image(depth)
        h, w = image.shape[:2]
        if w > 640:
            s = 640 / w
            image = cv2.resize(image, None, fx=s, fy=s)
            vis = cv2.resize(vis, None, fx=s, fy=s)
        cv2.imshow(f"Depth Anything - {identifier}", np.hstack([image, vis]))
        if cv2.waitKey(1) & 0xFF == ord("q"):
            raise KeyboardInterrupt

    def cleanup(self):
        self.source.close()
        if cv2 is not None:
            cv2.destroyAllWindows()
        if self.ros2_node is not None:
            self.ros2_node.shutdown()
