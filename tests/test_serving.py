"""Serving executor: batching, bucketing, futures, shutdown, races."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionrenderer_tpu.config import DiTConfig, VAEConfig
from diffusionrenderer_tpu.models.dit import init_dit_params
from diffusionrenderer_tpu.models.vae import init_vae_params
from diffusionrenderer_tpu.pipeline import DiffusionRendererPipeline
from diffusionrenderer_tpu.serving import ServingExecutor

NET = DiTConfig(model_channels=48, num_blocks=1, num_heads=2,
                adaln_lora_dim=8, crossattn_emb_channels=16)
VAE = VAEConfig(encoder_block_out_channels=(8, 12, 16, 16),
                decode_block_out_channels=(12, 16, 16, 16), num_layers=1)


@pytest.fixture(scope="module")
def pipeline():
    return DiffusionRendererPipeline(
        init_dit_params(jax.random.key(0), NET, dtype=jnp.float32),
        init_vae_params(jax.random.key(1), VAE, dtype=jnp.float32),
        model_type="inverse", num_steps=1, compute_dtype="float32",
        net_config=NET, vae_config=VAE,
    )


def req(i):
    return {
        "rgb": jnp.full((1, 1, 16, 16, 3), (i % 5) / 5.0 * 2 - 1, jnp.float32),
        "context_index": jnp.asarray([i % 5], jnp.int32),
    }


class TestServing:
    def test_single_request(self, pipeline):
        ex = ServingExecutor(pipeline, max_batch=2)
        try:
            out = ex.submit(req(0)).result(timeout=300)
            assert out.shape == (1, 1, 16, 16, 3)
            assert out.dtype == np.uint8
        finally:
            ex.shutdown()

    def test_concurrent_requests_all_resolve(self, pipeline):
        ex = ServingExecutor(pipeline, max_batch=4, max_wait_ms=50)
        try:
            futs = [ex.submit(req(i)) for i in range(6)]
            outs = [f.result(timeout=300) for f in futs]
            assert all(o.shape == (1, 1, 16, 16, 3) for o in outs)
            # Different context indices must give different outputs.
            assert np.abs(
                outs[0].astype(int) - outs[1].astype(int)
            ).max() > 0
        finally:
            ex.shutdown()

    def test_mixed_shapes_bucketed(self, pipeline):
        ex = ServingExecutor(pipeline, max_batch=4, max_wait_ms=50)
        try:
            small = ex.submit(req(0))
            big = ex.submit({
                "rgb": jnp.zeros((1, 1, 32, 32, 3), jnp.float32),
                "context_index": jnp.zeros((1,), jnp.int32),
            })
            assert small.result(timeout=300).shape == (1, 1, 16, 16, 3)
            assert big.result(timeout=300).shape == (1, 1, 32, 32, 3)
        finally:
            ex.shutdown()

    def test_mixed_seeds_match_solo_dispatch(self, pipeline):
        """Batching must never change a request's output: each batched row
        equals the same request dispatched alone with its own seed."""
        solo = {s: pipeline.generate(req(0), seed=s) for s in (7, 1234)}
        assert np.abs(
            solo[7].astype(int) - solo[1234].astype(int)
        ).max() > 0, "seeds must matter for this test to be meaningful"

        ex = ServingExecutor(pipeline, max_batch=2, max_wait_ms=200)
        try:
            f1 = ex.submit(req(0), seed=7)
            f2 = ex.submit(req(0), seed=1234)
            np.testing.assert_array_equal(f1.result(timeout=300), solo[7])
            np.testing.assert_array_equal(f2.result(timeout=300), solo[1234])
        finally:
            ex.shutdown()

    def test_shutdown_idempotent(self, pipeline):
        ex = ServingExecutor(pipeline)
        ex.shutdown()
        ex.shutdown()

    def test_trickle_bounded_by_one_absolute_deadline(self, pipeline):
        """A steady trickle slower than max_wait must NOT hold the batch
        open per-arrival: batch formation is bounded by ONE max_wait_ms
        from the first request (a per-get timeout would reset on every
        arrival, stretching to ~max_batch x max_wait)."""
        import threading
        import time
        from concurrent.futures import Future

        from diffusionrenderer_tpu.serving import Request

        ex = ServingExecutor(pipeline, max_batch=8, max_wait_ms=200)
        ex.shutdown()  # stop the worker; drive _collect_batch directly
        stop = threading.Event()

        def trickle():
            while not stop.is_set():
                ex._queue.put(Request(req(0), 0, False, Future(), ("b",)))
                stop.wait(0.12)  # slower than nothing, faster than max_wait

        t = threading.Thread(target=trickle, daemon=True)
        t0 = time.monotonic()
        t.start()
        try:
            batch = ex._collect_batch()
            elapsed = time.monotonic() - t0
        finally:
            stop.set()
            t.join(timeout=5)
        # Old behavior: every 0.12 s arrival reset the 0.2 s timeout, so the
        # batch filled to 8 over ~0.96 s.  New: one absolute 0.2 s deadline.
        assert elapsed < 0.6, f"batch held open {elapsed:.2f}s"
        assert 1 <= len(batch) < 8

    def test_submit_after_shutdown_raises(self, pipeline):
        ex = ServingExecutor(pipeline)
        ex.shutdown()
        with pytest.raises(RuntimeError):
            ex.submit(req(0))

    def test_graceful_shutdown_drains_accepted_requests(self, pipeline):
        """Every future returned by submit before shutdown(drain=True) must
        RESOLVE (not error): the worker drains the queue — including
        different-bucket requests deferred mid-batch — before exiting."""
        ex = ServingExecutor(pipeline, max_batch=4, max_wait_ms=20)
        futs = [ex.submit(req(i)) for i in range(5)]
        # A different bucket enqueued last: the old requeue-behind-sentinel
        # bug dropped exactly this request on shutdown.
        futs.append(ex.submit({
            "rgb": jnp.zeros((1, 1, 32, 32, 3), jnp.float32),
            "context_index": jnp.zeros((1,), jnp.int32),
        }))
        ex.shutdown(drain=True, join_timeout=300)
        for i, f in enumerate(futs):
            out = f.result(timeout=1)  # must already be done
            expect = 32 if i == 5 else 16
            assert out.shape == (1, 1, expect, expect, 3)

    def test_abort_shutdown_completes_every_future(self, pipeline):
        """shutdown(drain=False): nothing hangs — each future either
        resolved (already in flight) or fails fast with RuntimeError."""
        ex = ServingExecutor(pipeline, max_batch=2, max_wait_ms=5)
        futs = [ex.submit(req(i)) for i in range(8)]
        ex.shutdown(drain=False, join_timeout=300)
        resolved = failed = 0
        for f in futs:
            assert f.done(), "future left pending after shutdown"
            if f.exception() is None:
                resolved += 1
            else:
                assert isinstance(f.exception(), RuntimeError)
                failed += 1
        assert resolved + failed == 8

    def test_concurrent_submitters_race_shutdown(self, pipeline):
        """Many threads hammering submit while shutdown lands concurrently:
        the accept/shutdown lock means every request is either rejected with
        RuntimeError at submit time or its future resolves — no future may
        be accepted and then never complete."""
        import threading

        ex = ServingExecutor(pipeline, max_batch=4, max_wait_ms=5)
        accepted, rejected = [], []
        acc_lock = threading.Lock()
        start = threading.Barrier(5)

        def submitter(tid):
            start.wait()
            for i in range(10):
                try:
                    f = ex.submit(req(tid * 10 + i))
                except RuntimeError:
                    with acc_lock:
                        rejected.append(tid)
                    return
                with acc_lock:
                    accepted.append(f)

        threads = [threading.Thread(target=submitter, args=(t,))
                   for t in range(4)]
        for t in threads:
            t.start()
        start.wait()          # all submitters released together
        time.sleep(0.05)      # let some requests land first
        ex.shutdown(drain=True, join_timeout=600)
        for t in threads:
            t.join(timeout=30)
        assert accepted, "race produced no accepted requests"
        for f in accepted:
            out = f.result(timeout=1)  # drain=True: all accepted resolve
            assert out.shape == (1, 1, 16, 16, 3)

    def test_mixed_bucket_trickle_fairness(self, pipeline):
        """Interleaved requests from two shape buckets, arriving as a slow
        trickle, must all resolve — a different-bucket arrival closes the
        current batch and is requeued, never dropped or starved."""
        import time

        ex = ServingExecutor(pipeline, max_batch=4, max_wait_ms=50)
        try:
            futs = []
            for i in range(6):
                if i % 2 == 0:
                    futs.append(ex.submit(req(i)))
                else:
                    futs.append(ex.submit({
                        "rgb": jnp.zeros((1, 1, 32, 32, 3), jnp.float32),
                        "context_index": jnp.zeros((1,), jnp.int32),
                    }))
                time.sleep(0.02)
            outs = [f.result(timeout=300) for f in futs]
            for i, o in enumerate(outs):
                expect = 16 if i % 2 == 0 else 32
                assert o.shape == (1, 1, expect, expect, 3)
        finally:
            ex.shutdown()
