"""Native runtime: bounded drop-oldest queues, PNG decode, ordered
prefetch, and the threaded stage pipeline."""
import io
import time

import numpy as np
import pytest

from d2slam_tpu.runtime import (
    FramePipeline,
    FrameQueue,
    ImagePrefetcher,
    decode_png,
)


def test_queue_fifo_and_stats():
    q = FrameQueue(capacity=4, drop_oldest=True)
    for i in range(3):
        assert q.push_obj({"i": i}) == 0
    assert len(q) == 3
    assert q.pop_obj()["i"] == 0
    assert q.pop_obj()["i"] == 1
    s = q.stats
    assert s["pushed"] == 3 and s["popped"] == 2 and s["dropped"] == 0


def test_queue_drop_oldest_under_load():
    q = FrameQueue(capacity=2, drop_oldest=True)
    for i in range(5):
        q.push_obj(i)
    assert len(q) == 2
    assert q.stats["dropped"] == 3
    # the two NEWEST survive (reference drops stale frames)
    assert q.pop_obj() == 3 and q.pop_obj() == 4


def test_queue_reject_policy_and_timeout():
    q = FrameQueue(capacity=1, drop_oldest=False)
    assert q.push_obj("a") == 0
    assert q.push_obj("b") == -1          # full, rejected
    t0 = time.time()
    assert q.pop(timeout_ms=50) is not None
    assert q.pop(timeout_ms=60) is None   # empty -> timeout
    assert time.time() - t0 < 2.0


def _png_bytes(arr, mode):
    from PIL import Image

    b = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(b, format="PNG")
    return b.getvalue()


@pytest.mark.parametrize("case", ["gray8", "rgb8", "gray16"])
def test_png_decode_matches_pil(case):
    rng = np.random.RandomState(0)
    if case == "gray8":
        arr = rng.randint(0, 256, (48, 64), np.uint8)
        data = _png_bytes(arr, "L")
    elif case == "rgb8":
        arr = rng.randint(0, 256, (32, 40, 3), np.uint8)
        data = _png_bytes(arr, "RGB")
    else:
        arr = rng.randint(0, 1 << 16, (24, 36), np.uint16)
        data = _png_bytes(arr, "I;16B")
        # PIL's I;16B writer byte-swaps; ground truth is PIL's own
        # read-back of the file it wrote
        from PIL import Image

        arr = np.asarray(Image.open(io.BytesIO(data))).astype(np.uint16)
    out = decode_png(data)
    np.testing.assert_array_equal(out, arr)


def test_prefetcher_ordered(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(1)
    imgs, paths = [], []
    for i in range(12):
        a = rng.randint(0, 256, (30, 40), np.uint8)
        a[0, 0] = i  # order marker
        p = str(tmp_path / f"img_{i:03d}.png")
        Image.fromarray(a, mode="L").save(p)
        imgs.append(a)
        paths.append(p)
    got = list(ImagePrefetcher(paths, n_threads=3, window=4))
    assert len(got) == 12
    for i, (a, b) in enumerate(zip(imgs, got)):
        np.testing.assert_array_equal(a, b)


def test_pipeline_stages_and_drops():
    def slow_consume(x):
        time.sleep(0.03)
        return x * 10

    pipe = FramePipeline([
        ("ingest", lambda x: x + 1, 2, True),   # fast
        ("solve", slow_consume, 2, True),       # slow -> backpressure
    ]).start()
    for i in range(20):
        pipe.submit(i)
        time.sleep(0.002)
    out = pipe.drain()
    # slow stage forced drops at the bounded ingress queues; with
    # in-flight-aware drain the accounting is exact: every submitted
    # item is either dropped at a queue or delivered
    assert sum(pipe.dropped.values()) > 0
    assert len(out) + sum(pipe.dropped.values()) == 20
    # everything that made it through is correctly transformed, in order
    assert all(o % 10 == 0 for o in out)
    assert out == sorted(out)
    assert pipe.stats["solve"].mean_ms >= 25.0


def test_pipeline_drain_waits_for_slow_inflight_stage():
    """drain() must not lose the result of a stage fn still executing
    (e.g. a first-call JAX compile) when all queues look empty."""
    def very_slow(x):
        time.sleep(0.5)
        return x + 100

    pipe = FramePipeline([
        ("fast", lambda x: x, 2, True),
        ("compileish", very_slow, 2, True),
    ]).start()
    pipe.submit(1)
    time.sleep(0.1)  # item is now in-flight inside very_slow
    out = pipe.drain(timeout_s=5.0)
    assert out == [101]
    assert sum(pipe.dropped.values()) == 0


def test_euroc_play_with_native_prefetch(tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from test_dataset_e2e import build_dataset

    from d2slam_tpu.datasets.euroc import EuRoCDataset

    root, _ = build_dataset(tmp_path, n_frames=6)
    ds = EuRoCDataset(root)
    plain = [ev for ev in ds.play() if ev[0] == "frame"]
    fetched = [ev for ev in ds.play(prefetch=True) if ev[0] == "frame"]
    assert len(plain) == len(fetched) == 6
    for (_, t0, im0), (_, t1, im1) in zip(plain, fetched):
        assert t0 == t1
        for a, b in zip(im0, im1):
            np.testing.assert_allclose(a, b, atol=1e-7)
