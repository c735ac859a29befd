"""RTAB-Map DB replay tests against a synthesized database.

The DB is built to the schema the reference reverse-engineered
(db_schema.txt + db_player_node.py): Node(id)/Data(id, image JPEG,
calibration blob with int32 w/h at indices 4/5 and float64 K at offset 44).
"""

import sqlite3
import struct

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from txr.io.rtabmap_db import RTABMapDBSource, parse_calibration_blob, db_info


def make_calib_blob(fx, fy, cx, cy, w, h) -> bytes:
    ints = np.zeros(6, np.int32)
    ints[4] = w
    ints[5] = h
    head = ints.tobytes()                  # 24 bytes
    pad = b"\x00" * (44 - len(head))       # K at byte offset 44
    K = np.array([fx, 0, cx, 0, fy, cy, 0, 0, 1], np.float64)
    return head + pad + K.tobytes()


@pytest.fixture()
def rtabmap_db(tmp_path):
    db = tmp_path / "session.db"
    conn = sqlite3.connect(db)
    cur = conn.cursor()
    cur.execute("CREATE TABLE Node (id INTEGER PRIMARY KEY, pose BLOB, stamp REAL)")
    cur.execute("CREATE TABLE Data (id INTEGER PRIMARY KEY, image BLOB, "
                "depth BLOB, calibration BLOB)")
    rng = np.random.default_rng(0)
    calib = make_calib_blob(500.0, 510.0, 320.0, 240.0, 640, 480)
    for i in range(1, 6):
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        ok, jpeg = cv2.imencode(".jpg", img)
        assert ok
        cur.execute("INSERT INTO Node (id, stamp) VALUES (?, ?)", (i, i * 0.1))
        cur.execute("INSERT INTO Data (id, image, calibration) VALUES (?, ?, ?)",
                    (i, jpeg.tobytes(), calib if i == 1 else None))
    # A node with no image (must be skipped by the JOIN).
    cur.execute("INSERT INTO Node (id, stamp) VALUES (99, 9.9)")
    cur.execute("INSERT INTO Data (id, image) VALUES (99, NULL)")
    conn.commit()
    conn.close()
    return str(db)


class TestCalibrationBlob:
    def test_roundtrip(self):
        blob = make_calib_blob(600.0, 610.0, 319.5, 239.5, 640, 480)
        intr = parse_calibration_blob(blob)
        assert intr.fx == 600.0 and intr.fy == 610.0
        assert intr.cx == 319.5 and intr.cy == 239.5
        assert intr.width == 640 and intr.height == 480

    def test_garbage_blob(self):
        assert parse_calibration_blob(b"\x01\x02") is None


class TestDBSource:
    def test_replay(self, rtabmap_db):
        src = RTABMapDBSource(rtabmap_db)
        assert len(src) == 5
        assert src.intrinsics.fx == 500.0
        frames = list(src)
        assert len(frames) == 5
        img, ts, ident = frames[0]
        assert img.shape == (480, 640, 3)
        assert ident == "node_000001"
        src.close()

    def test_loop_mode(self, rtabmap_db):
        src = RTABMapDBSource(rtabmap_db, loop=True)
        seen = []
        for i, (img, ts, ident) in enumerate(src):
            seen.append(ident)
            if i >= 7:
                break
        assert seen[0] == seen[5]  # wrapped around
        src.close()

    def test_intrinsics_rescale(self, tmp_path):
        """Calibration says 1280x960 but images are 640x480 → rescaled."""
        db = tmp_path / "mismatch.db"
        conn = sqlite3.connect(db)
        cur = conn.cursor()
        cur.execute("CREATE TABLE Node (id INTEGER PRIMARY KEY, stamp REAL)")
        cur.execute("CREATE TABLE Data (id INTEGER PRIMARY KEY, image BLOB, calibration BLOB)")
        img = np.zeros((480, 640, 3), np.uint8)
        ok, jpeg = cv2.imencode(".jpg", img)
        calib = make_calib_blob(1000.0, 1000.0, 640.0, 480.0, 1280, 960)
        cur.execute("INSERT INTO Node VALUES (1, 0.0)")
        cur.execute("INSERT INTO Data VALUES (1, ?, ?)", (jpeg.tobytes(), calib))
        conn.commit()
        conn.close()
        src = RTABMapDBSource(str(db))
        next(src)
        assert src.intrinsics.fx == 500.0  # 1000 * 640/1280
        assert src.intrinsics.width == 640
        src.close()

    def test_db_info(self, rtabmap_db):
        info = db_info(rtabmap_db)
        assert "Node" in info["tables"] and "Data" in info["tables"]
        assert info["tables"]["Node"]["rows"] == 6

    def test_empty_db_raises(self, tmp_path):
        db = tmp_path / "empty.db"
        conn = sqlite3.connect(db)
        conn.execute("CREATE TABLE Node (id INTEGER PRIMARY KEY)")
        conn.execute("CREATE TABLE Data (id INTEGER PRIMARY KEY, image BLOB)")
        conn.commit()
        conn.close()
        with pytest.raises(ValueError):
            RTABMapDBSource(str(db))


class TestDegenerateDBs:
    def test_all_corrupt_blobs_stop(self, tmp_path):
        """loop=True over a DB whose every image blob fails to decode must
        raise StopIteration after one full pass, not busy-spin (review r2)."""
        db = tmp_path / "bad.db"
        conn = sqlite3.connect(db)
        cur = conn.cursor()
        cur.execute("CREATE TABLE Node (id INTEGER PRIMARY KEY, pose BLOB, "
                    "stamp REAL)")
        cur.execute("CREATE TABLE Data (id INTEGER PRIMARY KEY, image BLOB, "
                    "depth BLOB, calibration BLOB)")
        for i in range(1, 4):
            cur.execute("INSERT INTO Node (id, stamp) VALUES (?, ?)",
                        (i, i * 0.1))
            cur.execute("INSERT INTO Data (id, image) VALUES (?, ?)",
                        (i, b"not a jpeg"))
        conn.commit()
        conn.close()
        src = RTABMapDBSource(str(db), loop=True)
        with pytest.raises(StopIteration):
            next(src)

    def test_prefetch_wraps_db_source(self, rtabmap_db):
        """PrefetchSource iterates the DB on a worker thread; the sqlite
        connection must allow cross-thread use (review r2)."""
        from txr.io.sources import PrefetchSource

        src = PrefetchSource(RTABMapDBSource(rtabmap_db))
        frames = list(src)
        assert len(frames) == 5
