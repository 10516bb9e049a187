"""Race-safety stress harness for the host-side shared mutable state.

The reference's shared state (global envmap cache, pipeline model cache —
ref: preprocess_envmap.py:66, diffusion_renderer_pipeline.py:89-90) is
unguarded, safe only under ComfyUI's single-executor model.  This framework
may be driven from many host threads feeding one device, so its shared
structures must survive adversarial interleaving.  These tests hammer them
from barrier-released thread pools and assert the invariants that a torn
update would break.  (The serving executor's submit/shutdown races are
stressed in tests/test_serving.py.)
"""

import threading

from diffusionrenderer_tpu.utils.cache import LRUCache


class TestLRUCacheRaces:
    def test_hammer_get_put_invariants(self):
        cache = LRUCache(max_size=8)
        n_threads, n_ops = 8, 500
        start = threading.Barrier(n_threads)
        errors = []

        def worker(tid):
            try:
                start.wait()
                for i in range(n_ops):
                    k = (tid * 7 + i) % 24  # 24 keys > max_size: evictions
                    v = cache.get(k)
                    if v is not None:
                        # A torn put could expose another key's value.
                        assert v == k * 2, (k, v)
                    cache.put(k, k * 2)
                    if i % 97 == 0:
                        assert len(cache) <= 8
            except Exception as e:  # pragma: no cover - fail the test below
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(t,))
                   for t in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors
        assert len(cache) <= 8
        # Accounting is atomic: every get was counted exactly once.
        assert cache.hits + cache.misses == n_threads * n_ops

    def test_hammer_with_concurrent_clear(self):
        cache = LRUCache(max_size=4)
        stop = threading.Event()
        errors = []

        def putter():
            try:
                i = 0
                while not stop.is_set():
                    cache.put(i % 10, i)
                    cache.get((i + 3) % 10)
                    i += 1
            except Exception as e:  # pragma: no cover
                errors.append(e)

        def clearer():
            try:
                while not stop.is_set():
                    cache.clear()
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=putter) for _ in range(4)]
        threads.append(threading.Thread(target=clearer))
        for t in threads:
            t.start()
        stop_timer = threading.Timer(1.0, stop.set)
        stop_timer.start()
        for t in threads:
            t.join(timeout=30)
        stop_timer.cancel()
        assert not errors, errors
        assert len(cache) <= 4


class TestEnvmapCacheRaces:
    def test_concurrent_identical_loads_share_cache(self):
        """Many threads preprocessing the same envmap through the cached
        projection path concurrently: no corruption, identical results."""
        import numpy as np

        from diffusionrenderer_tpu import envmap

        pano = np.abs(np.random.default_rng(0)
                      .normal(0.5, 0.3, (16, 32, 3))).astype(np.float32)
        ref = envmap.render_projection_from_panorama(
            pano, (8, 8), cubemap_res=8)
        errors = []
        start = threading.Barrier(8)

        def worker():
            try:
                start.wait()
                for _ in range(5):
                    out = envmap.render_projection_from_panorama(
                        pano, (8, 8), cubemap_res=8)
                    for k in ("env_ldr", "env_log"):
                        np.testing.assert_array_equal(np.asarray(out[k]),
                                                      np.asarray(ref[k]))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
