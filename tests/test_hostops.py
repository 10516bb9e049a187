"""Torch-backed host conversions: numerical equivalence with numpy."""

import ml_dtypes
import numpy as np

from diffusionrenderer_tpu.utils.hostops import (
    to_bfloat16,
    to_float32,
    to_signed_range,
    u8_to_unit_float,
)


def test_u8_to_unit_float():
    x = np.arange(256, dtype=np.uint8).reshape(2, 128)
    got = u8_to_unit_float(x)
    np.testing.assert_allclose(got, x.astype(np.float32) / 255.0)
    assert got.dtype == np.float32


def test_to_signed_range():
    x = np.linspace(0, 1, 97, dtype=np.float32).reshape(97, 1)
    np.testing.assert_allclose(to_signed_range(x), x * 2.0 - 1.0)


def test_to_signed_range_from_float64():
    x = np.linspace(0, 1, 13)
    got = to_signed_range(x)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, (x * 2 - 1).astype(np.float32),
                               rtol=1e-6)


def test_to_signed_range_does_not_mutate_input():
    x = np.full((4, 4), 0.25, np.float32)
    to_signed_range(x)
    np.testing.assert_array_equal(x, np.full((4, 4), 0.25, np.float32))


def test_to_float32_passthrough_and_cast():
    x = np.ones((3, 3), np.float32)
    assert to_float32(x) is x  # contiguous fp32: zero-copy
    y = np.ones((3, 3), np.float64)
    assert to_float32(y).dtype == np.float32


def test_to_bfloat16_matches_ml_dtypes_rounding():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((257, 33)) * 100).astype(np.float32)
    got = to_bfloat16(x)
    assert got.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(got, x.astype(ml_dtypes.bfloat16))


def test_broadcast_view_input():
    # Non-writable broadcast views must convert correctly (env tensors).
    base = np.linspace(0, 1, 12, dtype=np.float32).reshape(3, 4)
    view = np.broadcast_to(base, (2, 3, 4))
    np.testing.assert_allclose(to_signed_range(view),
                               view.astype(np.float32) * 2 - 1)
