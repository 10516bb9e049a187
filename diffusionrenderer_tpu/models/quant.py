"""int8 quantization for the DiT: weight-only (W8) and weight+activation (W8A8).

Purpose: the flagship 7.23B model is 13.48 GiB in bf16 — over the ~14.5 GiB
usable HBM of a single v5e once flagship-shape activations are added.
Per-output-channel symmetric int8 halves the weights to 6.74 GiB, making
single-chip flagship inference possible (the deployment alternative is
tensor-parallel >= 2 chips via parallel/sharding.py).

Weight-only scheme ({'q','s'} leaves): for each big matmul weight W (in, out):
    scale[out] = max(|W[:, out]|) / 127
    W_q = round(W / scale)  (int8)
    dense(x) = (x @ W_q) * scale        — the dequant rides the matmul output
XLA fuses the int8->bf16 convert into the matmul read, so the bf16
dequantized copy exists only tile-by-tile, never materialized per block.

Per-GROUP scales (group_size=g): scale[in_group, out] over g input rows
instead of the whole column — max|N(0,s)| over 128 samples is ~3.3 vs ~4.25
sigma over 4096, cutting quantization error ~22% (more on real checkpoints,
whose outlier rows inflate whole-column scales).  Grouped leaves carry a
rank+1 scale (..., G, out).  The weight-only grouped dequant multiplies the
group scale into the int8 read (still fused); the grouped W8A8 matmul runs
per-group int8 dots with int32 accumulation inside each group and an fp32
scale-fold at group boundaries (see ops/quant_matmul.py for the Pallas
kernel that does this without materializing L-sized temporaries).

W8A8 scheme ({'q','sa'} leaves; the KEY NAME carries the mode so the pytree
stays scannable — a bool marker leaf would need a stacked num_blocks axis):
activations are additionally quantized per token at runtime
    ax[tok] = max(|x[tok, :]|) / 127;  x_q = round(x / ax)  (int8)
and the matmul runs int8 x int8 -> int32 on the MXU's 394 TOPS int8 path
(2x the 197 TFLOP/s bf16 peak on v5e); the output is rescaled by the
per-token x per-channel outer product ax * s.  Measured at the flagship MLP
shape (28160x4096 @ 4096x16384): 35.9 ms vs 44.3 ms weight-only (1.23x),
with mean relative error 4.1% vs 3.3% weight-only against an fp32 oracle —
an opt-in speed/accuracy trade (CLI --w8a8).

Only the stacked per-block matmuls (wq/wk/wv/wo, mlp w1/w2) are quantized —
they are 97% of the parameters; AdaLN, norms, embedders and the final
projection stay bf16 (they are tiny and modulation is precision-sensitive).
`keep_bf16` exempts named matmuls (e.g. {"wo", "w2"} — the residual-stream
projections) for mixed-precision deployment modes.

Round-5 quantizers (all convert-time; the reference ships bf16-only,
/root/reference/nodes.py:76 — this ladder exists because a 16 GiB v5e cannot
hold the 13.48 GiB bf16 weights):

* **MSE-optimal clipping** (`_mse`): instead of scale = amax/127, grid-search
  a per-scale-group clip ratio minimizing the weight-space quantization MSE.
  Calibration-free; helps heavy-tailed weights where one outlier inflates the
  whole group's scale.
* **Block-Hadamard rotation** (`_had`, QuaRot-style): rotate the matmul's
  input space by an orthogonal block-diagonal (sign-randomized) Hadamard —
  W' = H_b(hs·W), runtime x' = (x·hs)@H_b — an EXACT identity (x'W' ≡ xW up
  to fp rounding) that spreads weight-row outliers across each 128-row block
  before quantization.  Runtime cost: one (K/128)×128×128 matmul per dense
  call, ~0.8% of the MLP-up FLOPs.  The 'hs' leaf marks rotated weights.
* **Scale migration** (`_awq`, AWQ/SmoothQuant family): per-input-channel
  scales di — W' = W/di, runtime x' = x·di — migrating weight-row outliers
  into the (bf16 or per-token-quantized) activations.  di_j =
  max|W_j|^(1-α) / mean|x_j|^α with α grid-searched per (block, site)
  against the calibration-weighted output-error proxy.  Needs captured
  activation stats (models/calibrate.py).
* **GPTQ error-compensating rounding** (`_gptq`): quantize input dims
  sequentially, propagating each dim's rounding error onto not-yet-quantized
  dims through the calibration Hessian H = ΣxᵀX (Frantar et al.'s Cholesky
  formulation).  Runs host-side in torch at convert time; needs per-site H
  from models/calibrate.py.  Applied to sites with a captured H (the
  16384-dim mlp.w2 H is 1 GiB/block — not captured by default).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

QUANTIZED_BLOCK_WEIGHTS = {
    "fa": ("wq", "wk", "wv", "wo"),
    "ca": ("wq", "wk", "wv", "wo"),
    "mlp": ("w1", "w2"),
}

# Which calibration site (models/calibrate.py capture names) feeds each
# quantized leaf's input.  ca.wq/ca.wk never execute on the single-KV
# cross-attention fast path (models/dit.py) — they have no live input site
# and calibrated quantizers leave them at plain RTN (their quantization
# damage is zero because they are dead computation).
LEAF_SITE = {
    "fa.wq": "fa.qkv", "fa.wk": "fa.qkv", "fa.wv": "fa.qkv",
    "fa.wo": "fa.wo",
    "ca.wv": "ca.wv", "ca.wo": "ca.wo",
    "mlp.w1": "mlp.w1", "mlp.w2": "mlp.w2",
}


class QuantMode(NamedTuple):
    """Parsed deployment quant mode (see parse_quant_mode)."""

    act_quant: bool
    group_size: Optional[int]
    keep: tuple
    hadamard: bool = False
    mse_clip: bool = False
    awq: bool = False
    gptq: bool = False
    mix_blocks: int = 0

    @property
    def needs_calibration(self) -> bool:
        return self.awq or self.gptq


# ---------------------------------------------------------------------------
# Block-Hadamard rotation (QuaRot-style, exact)
# ---------------------------------------------------------------------------

_HADAMARD_BLOCK = 128  # one VREG lane width; 0.8% extra FLOPs at MLP shapes


@functools.lru_cache(maxsize=8)
def _hadamard_matrix(n: int) -> np.ndarray:
    """Normalized Sylvester Hadamard H/sqrt(n): symmetric, orthogonal,
    its own inverse — so weight and activation transforms use the SAME
    matrix."""
    assert n & (n - 1) == 0, f"Hadamard size must be a power of 2, got {n}"
    h = np.ones((1, 1), np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h / np.sqrt(np.float32(n))


def hadamard_block(k: int) -> int:
    """Rotation block size for a K-row weight: 128 when it divides K (the
    production dims 4096/16384/1024), else the largest power-of-2 divisor
    (tiny test configs).  Returns 1 when K is odd — rotation skipped."""
    if k % _HADAMARD_BLOCK == 0:
        return _HADAMARD_BLOCK
    b = 1
    while k % (b * 2) == 0 and b * 2 <= _HADAMARD_BLOCK:
        b *= 2
    return b


def _hadamard_signs(k: int) -> np.ndarray:
    """Deterministic Rademacher signs (shared across blocks): randomizes the
    rotation so weight rows correlated with Hadamard columns still spread."""
    rng = np.random.default_rng(0x5EED)
    return (rng.integers(0, 2, k) * 2 - 1).astype(np.float32)


def hadamard_rotate(x: jax.Array, signs: jax.Array) -> jax.Array:
    """x' = (x * signs) @ blockdiag(H_b) over the last axis — the runtime
    activation half of the rotation pair (exact orthogonal transform)."""
    k = x.shape[-1]
    b = hadamard_block(k)
    if b <= 1:
        return x
    h = jnp.asarray(_hadamard_matrix(b), x.dtype)
    xs = (x * signs.astype(x.dtype)).reshape(*x.shape[:-1], k // b, b)
    out = jnp.einsum("...gi,ij->...gj", xs, h,
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype).reshape(x.shape)


_MSE_CLIP_RATIOS = np.linspace(1.0, 0.5, 11)


def _mse_scale_jnp(wg: jax.Array, base_scale: jax.Array) -> jax.Array:
    """Grid-search a clip ratio per scale group minimizing quantization MSE.

    wg: grouped weight view whose axis -2 is the scale group; base_scale the
    amax/127 scale with keepdims on axis -2.  11 candidates in [0.5, 1.0] —
    int8 on Gaussian data optimizes near 1.0, heavy-tailed rows near 0.6."""
    best_s, best_e = base_scale, None
    for r in _MSE_CLIP_RATIOS:
        s = base_scale * np.float32(r)
        q = jnp.clip(jnp.round(wg / s), -127, 127)
        e = jnp.sum(jnp.square(q * s - wg), axis=-2, keepdims=True)
        if best_e is None:
            best_e = e
        else:
            best_s = jnp.where(e < best_e, s, best_s)
            best_e = jnp.minimum(e, best_e)
    return best_s


def quantize_tensor(w: jax.Array, act_quant: bool = False,
                    group_size: Optional[int] = None,
                    mse_clip: bool = False,
                    hadamard: bool = False,
                    migrate: Optional[jax.Array] = None
                    ) -> Dict[str, jax.Array]:
    """(..., in, out) -> {'q': int8, 's'|'sa': fp32 scales[, 'hs'][, 'di']}.

    group_size=None: per-output-channel scales, shape (..., out).
    group_size=g:    per-(input-group, output-channel), shape (..., G, out)
                     with G = in/g (in must divide evenly).
    act_quant=True stores the scale under 'sa', marking the leaf for runtime
    int8 activation quantization (W8A8) in dense_maybe_quantized.
    mse_clip: MSE-optimal clip search instead of amax scales.
    hadamard: block-Hadamard-rotate the input space before quantizing; emits
    the 'hs' sign leaf consumed by dense_maybe_quantized at runtime.
    migrate: per-input-channel activation multipliers di (..., in) — the
    weight is divided by di before quantizing and the leaf is emitted for
    the runtime x*di multiply (AWQ/SmoothQuant migration)."""
    wf = w.astype(jnp.float32)
    *lead, k, n = wf.shape
    extra: Dict[str, jax.Array] = {}
    if migrate is not None:
        di = jnp.asarray(migrate, jnp.float32)
        wf = wf / di[..., :, None]
        extra["di"] = jnp.broadcast_to(di, (*lead, k))
    if hadamard and hadamard_block(k) > 1:
        signs = jnp.asarray(_hadamard_signs(k))
        b = hadamard_block(k)
        h = jnp.asarray(_hadamard_matrix(b))
        wg = (wf * signs[:, None]).reshape(*lead, k // b, b, n)
        wf = jnp.einsum("ij,...gjn->...gin", h, wg).reshape(*lead, k, n)
        extra["hs"] = jnp.broadcast_to(signs, (*lead, k))
    if group_size is not None and k % group_size != 0:
        # Inputs narrower than (or not divisible by) the group — e.g. the
        # 16-row cross-attention wk/wv — keep per-channel scales (a 16-row
        # column IS one group).
        group_size = None
    if group_size is not None:
        wg = wf.reshape(*lead, k // group_size, group_size, n)
        amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
        scale = jnp.maximum(amax / 127.0, 1e-12)  # (..., G, 1, out)
        if mse_clip:
            scale = _mse_scale_jnp(wg, scale)
        q = jnp.clip(jnp.round(wg / scale), -127, 127).astype(jnp.int8)
        return {"q": q.reshape(*lead, k, n),
                ("sa" if act_quant else "s"): scale.squeeze(-2), **extra}
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # (..., 1, out)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    if mse_clip:
        scale = _mse_scale_jnp(wf, scale)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, ("sa" if act_quant else "s"): scale.squeeze(-2), **extra}


def _wscale(wq: Dict[str, jax.Array]) -> jax.Array:
    return wq["sa"] if "sa" in wq else wq["s"]


def _is_grouped(wq: Dict[str, jax.Array]) -> bool:
    # Grouped scales have one more axis than per-channel: q (..., in, out)
    # with scale (..., G, out) vs per-channel (..., out).
    return _wscale(wq).ndim == wq["q"].ndim


def dequantize_tensor(wq: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    q, s = wq["q"], _wscale(wq)
    if _is_grouped(wq):
        *lead, k, n = q.shape
        g = s.shape[-2]
        wf = q.astype(jnp.float32).reshape(*lead, g, k // g, n) * s[..., :, None, :]
        return wf.reshape(*lead, k, n).astype(dtype)
    return (q.astype(jnp.float32) * s[..., None, :]).astype(dtype)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and ("s" in w or "sa" in w)


def quantize_dit_params(params: Dict[str, Any],
                        act_quant: bool = False,
                        group_size: Optional[int] = None,
                        keep_bf16: Iterable[str] = (),
                        mse_clip: bool = False,
                        hadamard: bool = False) -> Dict[str, Any]:
    """Return a new params pytree with the stacked block matmuls int8.

    keep_bf16: matmul names ("wo", "w2", ...) or dotted "sub.name" forms
    ("mlp.w2") left in bf16 — mixed-precision modes.  mse_clip/hadamard are
    the calibration-free round-5 quantizers (see module docstring); the
    calibrated ones (awq/gptq) go through quantize_dit_params_host with
    captured stats."""
    keep = set(keep_bf16)
    out = dict(params)
    blocks = {}
    for sub, names in QUANTIZED_BLOCK_WEIGHTS.items():
        bp = dict(params["blocks"][sub])
        for name in names:
            if name in keep or f"{sub}.{name}" in keep:
                continue
            bp[name] = quantize_tensor(bp[name], act_quant=act_quant,
                                       group_size=group_size,
                                       mse_clip=mse_clip, hadamard=hadamard)
        blocks[sub] = bp
    out["blocks"] = blocks
    return out


def parse_quant_mode(mode: str) -> QuantMode:
    """Parse a deployment quant-mode string into a QuantMode:
    'w8a8_g128_keepres' -> QuantMode(act_quant=True, group_size=128,
    keep=('w2','wo')).

    Grammar: base 'w8' (weight-only) or 'w8a8' (+ runtime int8 activations),
    then any of: '_gN' per-group scales of N input rows; '_keepres' keeps the
    residual-stream projections (wo, w2) bf16; '_keepattn' keeps all four
    attention projections bf16 (MLP-only int8); '_mse' MSE-optimal clip
    scales; '_had' block-Hadamard input rotation; '_awq' calibrated scale
    migration; '_gptq' calibrated error-compensating rounding (the last two
    require capture stats from models/calibrate.py and are applied by
    quantize_dit_params_host).  Shared by bench.py, the CLI and the
    measurement scripts so every surface names modes identically (the
    accuracy ladder for these modes is in BASELINE.md)."""
    parts = mode.split("_")
    if parts[0] not in ("w8", "w8a8"):
        raise ValueError(f"unknown quant mode {mode!r} (base must be "
                         "w8 or w8a8)")
    act_quant = parts[0] == "w8a8"
    group_size = None
    keep = set()
    flags = {"hadamard": False, "mse_clip": False, "awq": False,
             "gptq": False}
    for p in parts[1:]:
        if p.startswith("g") and p[1:].isdigit():
            group_size = int(p[1:])
        elif p == "keepres":
            keep |= {"wo", "w2"}
        elif p == "keepattn":
            # All attention projections bf16, MLP w1/w2 int8: bf16 ~5.6 GiB
            # + int8 ~3.5 GiB of block weights — still a single-chip
            # flagship fit (vs 13.5 GiB all-bf16, which is not).
            keep |= {"wq", "wk", "wv", "wo"}
        elif p == "had":
            flags["hadamard"] = True
        elif p == "mse":
            flags["mse_clip"] = True
        elif p == "awq":
            flags["awq"] = True
        elif p == "gptq":
            flags["gptq"] = True
        elif p.startswith("mix") and p[3:].isdigit():
            # '_mixN': the N transformer blocks with the highest measured
            # quantization damage (Hessian-diagonal-weighted RTN error at
            # the calibrated sites; boundary blocks without calibration)
            # keep ALL their weights bf16 — the DiT runs them as separate
            # bf16 lax.scan segments (models/dit.py).  Blockwise mixed
            # precision: spends HBM where the damage is.
            flags["mix_blocks"] = int(p[3:])
        else:
            raise ValueError(f"unknown mode suffix {p!r} in {mode}")
    return QuantMode(act_quant, group_size, tuple(sorted(keep)), **flags)


def _to_torch_f32(w):
    """Host array (np / ml_dtypes-bf16 / jax) -> torch fp32 tensor.

    The math runs through torch, not numpy: per-channel quantization of the
    7B weight set touches ~6.7G elements, and this class of host runs
    numpy's elementwise kernels orders of magnitude slower than torch's
    vectorized path (see utils/hostops.py).  numpy cannot hold bf16, so
    bf16 inputs round-trip bit-wise through int16."""
    import ml_dtypes
    import torch

    from ..utils import hostops  # noqa: F401  (non-writable-input warning filter)

    arr = np.ascontiguousarray(np.asarray(w))
    if arr.dtype == ml_dtypes.bfloat16:
        t = torch.from_numpy(arr.view(np.int16)).view(torch.bfloat16)
        return t.to(torch.float32)
    t = torch.from_numpy(arr)
    return t.to(torch.float32) if t.dtype != torch.float32 else t


def _mse_scale_torch(wg, base_scale):
    """torch mirror of _mse_scale_jnp (group axis -2, keepdim scales)."""
    import torch

    best_s, best_e = base_scale, None
    for r in _MSE_CLIP_RATIOS:
        s = base_scale * float(r)
        q = torch.round(wg / s).clamp_(-127.0, 127.0)
        e = (q * s - wg).pow_(2).sum(dim=-2, keepdim=True)
        if best_e is None:
            best_e = e
        else:
            best_s = torch.where(e < best_e, s, best_s)
            best_e = torch.minimum(e, best_e)
    return best_s


def _rtn_torch(t, act_quant: bool, group_size: Optional[int],
               mse_clip: bool = False) -> Dict[str, Any]:
    """Round-to-nearest int8 on a torch fp32 tensor -> jnp leaf dict."""
    import torch

    skey = "sa" if act_quant else "s"
    if group_size is not None and t.shape[-2] % group_size != 0:
        group_size = None  # narrow inputs: per-channel (see quantize_tensor)
    if group_size is not None:
        *lead, k, n = t.shape
        tg = t.reshape(*lead, k // group_size, group_size, n)
        amax = tg.abs().amax(dim=-2, keepdim=True)
        scale = torch.clamp(amax / 127.0, min=1e-12)
        if mse_clip:
            scale = _mse_scale_torch(tg, scale)
        q = torch.round(tg / scale).clamp_(-127.0, 127.0).to(torch.int8)
        return {"q": jnp.asarray(q.reshape(*lead, k, n).numpy()),
                skey: jnp.asarray(scale.squeeze(-2).numpy())}
    amax = t.abs().amax(dim=-2, keepdim=True)
    scale = torch.clamp(amax / 127.0, min=1e-12)
    if mse_clip:
        scale = _mse_scale_torch(t, scale)
    q = torch.round(t / scale).clamp_(-127.0, 127.0).to(torch.int8)
    return {"q": jnp.asarray(q.numpy()),
            skey: jnp.asarray(scale.squeeze(-2).numpy())}


def _hadamard_rotate_torch(t, signs, axis: int):
    """Block-Hadamard rotate a torch tensor along `axis` (t' = H_b @ (s*t))."""
    import torch

    k = t.shape[axis]
    b = hadamard_block(k)
    h = torch.from_numpy(_hadamard_matrix(b).copy())
    t = torch.movedim(t, axis, -1) * torch.from_numpy(signs.copy())
    shape = t.shape
    t = (t.reshape(*shape[:-1], k // b, b) @ h).reshape(shape)
    return torch.movedim(t, -1, axis)


def quantize_tensor_host(w, act_quant: bool = False,
                         group_size: Optional[int] = None,
                         mse_clip: bool = False,
                         hadamard: bool = False,
                         migrate=None) -> Dict[str, Any]:
    """Host-side variant of quantize_tensor — used during checkpoint
    conversion so no fp32 device temporaries are created while the bf16
    weights are resident (that transient OOMs a 16 GB chip).  Same leaf
    contract as quantize_tensor, including the round-5 'hs'/'di' transform
    leaves."""
    import torch

    t = _to_torch_f32(w)
    *lead, k, n = t.shape
    extra: Dict[str, Any] = {}
    if migrate is not None:
        di = _to_torch_f32(migrate)
        t = t / di.unsqueeze(-1)
        extra["di"] = jnp.asarray(
            np.broadcast_to(di.numpy(), (*lead, k)).copy())
    if hadamard and hadamard_block(k) > 1:
        signs = _hadamard_signs(k)
        t = _hadamard_rotate_torch(t, signs, axis=-2)
        extra["hs"] = jnp.asarray(np.broadcast_to(signs, (*lead, k)).copy())
    out = _rtn_torch(t, act_quant, group_size, mse_clip=mse_clip)
    out.update(extra)
    return out


# ---------------------------------------------------------------------------
# Calibrated quantizers (AWQ-style migration + GPTQ) — convert-time, host
# ---------------------------------------------------------------------------

_AWQ_ALPHA_GRID = (0.0, 0.25, 0.5, 0.75, 1.0)


def awq_migration_host(t, amean, *, act_quant: bool,
                       group_size: Optional[int], ex2=None):
    """Per-input-channel migration multipliers di for ONE weight (K, N).

    t: torch fp32 (K, N); amean: mean|x| over the calibration set, (K,).
    Searches di = max|W_k|^(1-α) / amean_k^α (geometric-mean-normalized)
    over α and returns the torch (K,) di minimizing the calibration-weighted
    output-error proxy  Σ_k E[x_k²] di_k² ‖ΔW'_k‖²  (+ a per-token
    activation-quantization term when act_quant — approximated with mean-abs
    statistics since per-token maxima aren't captured).  α=0 is pure
    weight-outlier migration (weight-only modes), α=1 the SmoothQuant
    activation direction."""
    import torch

    k = t.shape[-2]
    wmax = t.abs().amax(dim=-1).clamp_(min=1e-8)           # (K,)
    xs = _to_torch_f32(amean).clamp(min=1e-8)              # (K,)
    ex2_t = (_to_torch_f32(ex2) if ex2 is not None else xs.pow(2)).clamp(
        min=1e-12)

    def _err(di):
        tw = t / di.unsqueeze(-1)
        leaf = _rtn_torch(tw, act_quant, group_size)
        s = np.asarray(leaf["sa" if act_quant else "s"])
        q = torch.from_numpy(np.asarray(leaf["q"])).to(torch.float32)
        st = torch.from_numpy(s)
        if st.ndim == 2:  # grouped (G, N): expand over group rows
            g = k // st.shape[0]
            dq = (q.reshape(st.shape[0], g, -1)
                  * st.unsqueeze(1)).reshape(k, -1)
        else:
            dq = q * st
        werr = (dq - tw).pow_(2).sum(dim=-1)               # (K,) ‖ΔW'_k‖²
        obj = (ex2_t * di.pow(2) * werr).sum()
        if act_quant:
            # Activation-quant proxy: per-token scale ≈ max_k(mean|x_k|·di_k)
            # /127, error variance s²/12 per channel → s²/12·‖W'‖²_F in the
            # output (mean-abs stands in for the per-token max, which isn't
            # captured — a systematic underestimate that cancels in the
            # argmin over α).
            s_tok = (xs * di).amax() / 127.0
            obj = obj + (s_tok ** 2 / 12.0) * tw.pow(2).sum()
        return float(obj)

    best_di, best_obj = None, None
    for alpha in _AWQ_ALPHA_GRID:
        di = wmax.pow(1.0 - alpha) / xs.pow(alpha)
        di = di / torch.exp(torch.log(di).mean())          # geomean 1
        obj = _err(di)
        if best_obj is None or obj < best_obj:
            best_di, best_obj = di, obj
    return best_di


def _transform_hessian_torch(h, di=None, signs=None):
    """H' for the transformed input space: x'=x·di → diag(di)·H·diag(di);
    x'=(x·hs)@H_b → R^T H R with R = diag(hs)·blockdiag(H_b)."""
    if di is not None:
        h = h * di.unsqueeze(-1) * di.unsqueeze(-2)
    if signs is not None:
        h = _hadamard_rotate_torch(h, signs, axis=-2)
        h = _hadamard_rotate_torch(h, signs, axis=-1)
    return h


def gptq_quantize_host(w, hessian, *, act_quant: bool = False,
                       group_size: Optional[int] = None,
                       mse_clip: bool = False,
                       damp: float = 0.01,
                       blocksize: int = 128) -> Dict[str, Any]:
    """GPTQ error-compensating rounding for ONE weight (K, N).

    w: torch fp32 (K, N), already in the final (migrated/rotated) input
    space; hessian: torch fp32 (K, K) = Σ xᵀx over calibration activations
    in the SAME space.  Input dims are quantized in natural order; each
    dim's rounding error is propagated onto later dims through the Cholesky
    factor of H⁻¹ (Frantar et al., GPTQ).  With H ∝ I this reduces exactly
    to RTN — the gain comes from correlated calibration activations.

    Grouped scales are computed from the error-compensated rows when the
    group is reached (group boundaries must nest within `blocksize`:
    power-of-2 groups ≤128, or group_size itself ≥128)."""
    import torch

    t = w.clone() if isinstance(w, torch.Tensor) else _to_torch_f32(w).clone()
    h = (hessian.clone() if isinstance(hessian, torch.Tensor)
         else _to_torch_f32(hessian).clone())
    k, n = t.shape
    skey = "sa" if act_quant else "s"
    if group_size is not None and k % group_size != 0:
        group_size = None
    if group_size is not None:
        if group_size > blocksize:
            blocksize = group_size
        assert blocksize % group_size == 0, (
            f"group {group_size} must nest within GPTQ block {blocksize}")

    diag = torch.arange(k)
    dead = torch.diag(h) <= 0
    h[diag[dead], diag[dead]] = 1.0
    t[dead, :] = 0.0
    h[diag, diag] += damp * torch.diag(h).mean()
    hinv = torch.cholesky_inverse(torch.linalg.cholesky(h))
    u = torch.linalg.cholesky(hinv, upper=True)            # (K, K) upper

    q_codes = torch.empty((k, n), dtype=torch.int8)
    if group_size is None:
        scale = torch.clamp(t.abs().amax(dim=0) / 127.0, min=1e-12)  # (N,)
        if mse_clip:
            scale = _mse_scale_torch(t, scale.unsqueeze(0)).squeeze(0)
        scales_out = scale
    else:
        scales_out = torch.empty((k // group_size, n))

    cur_scale = scale if group_size is None else None
    for bs in range(0, k, blocksize):
        be = min(bs + blocksize, k)
        wb = t[bs:be].clone()
        eb = torch.zeros_like(wb)
        ub = u[bs:be, bs:be]
        for i in range(be - bs):
            gi = bs + i
            if group_size is not None and gi % group_size == 0:
                grows = wb[i:i + group_size]
                gs = torch.clamp(grows.abs().amax(dim=0) / 127.0, min=1e-12)
                if mse_clip:
                    gs = _mse_scale_torch(grows, gs.unsqueeze(0)).squeeze(0)
                scales_out[gi // group_size] = gs
                cur_scale = gs
            qi = torch.round(wb[i] / cur_scale).clamp_(-127.0, 127.0)
            q_codes[gi] = qi.to(torch.int8)
            err = (wb[i] - qi * cur_scale) / ub[i, i]
            if i + 1 < be - bs:
                wb[i + 1:] -= ub[i, i + 1:].unsqueeze(1) * err.unsqueeze(0)
            eb[i] = err
        if be < k:
            t[be:] -= u[bs:be, be:].T @ eb

    return {"q": jnp.asarray(q_codes.numpy()),
            skey: jnp.asarray(scales_out.numpy())}


def quantize_leaf_host(w, mode: QuantMode, amean=None, hessian=None
                       ) -> Dict[str, Any]:
    """Quantize one (possibly stacked (nb, K, N)) matmul weight on host per
    a QuantMode, with optional calibration stats:

    amean: (nb, K) or (K,) mean|x| at this weight's input site (awq);
    hessian: (nb, K, K) or (K, K) Σxᵀx at the site (gptq).
    Calibrated quantizers silently fall back to RTN for leaves without stats
    (the dead ca.wq/ca.wk projections); modes REQUESTING calibration raise
    if stats are missing for a live site — that's the caller's job
    (quantize_dit_params_host checks via LEAF_SITE)."""
    import torch

    t = _to_torch_f32(w)
    stacked = t.ndim == 3
    lead = t.shape[:-2]
    k = t.shape[-2]
    tb = t if stacked else t.unsqueeze(0)
    nb = tb.shape[0]

    def _stat(a, i, nd):
        """Per-block slice of a stat that may be stacked (nd+1 dims) or
        shared (nd dims): nd=1 for amean (K,), nd=2 for hessian (K, K)."""
        if a is None:
            return None
        at = _to_torch_f32(a)
        return at[i] if at.ndim == nd + 1 else at

    extra: Dict[str, Any] = {}
    dis = []
    if mode.awq and amean is not None:
        for i in range(nb):
            ex2 = None
            hi = _stat(hessian, i, 2)
            if hi is not None:
                ex2 = torch.diagonal(hi)
            dis.append(awq_migration_host(
                tb[i], _stat(amean, i, 1), act_quant=mode.act_quant,
                group_size=mode.group_size, ex2=ex2))
        di = torch.stack(dis)
        tb = tb / di.unsqueeze(-1)
        extra["di"] = jnp.asarray(
            (di if stacked else di.squeeze(0)).numpy())
    signs = None
    if mode.hadamard and hadamard_block(k) > 1:
        signs = _hadamard_signs(k)
        tb = _hadamard_rotate_torch(tb, signs, axis=-2)
        extra["hs"] = jnp.asarray(np.broadcast_to(
            signs, (*lead, k) if stacked else (k,)).copy())

    if mode.gptq and hessian is not None:
        outs = []
        for i in range(nb):
            hi = _stat(hessian, i, 2)
            if dis:
                hi = _transform_hessian_torch(hi, di=dis[i])
            if signs is not None:
                hi = _transform_hessian_torch(hi, signs=signs)
            outs.append(gptq_quantize_host(
                tb[i], hi, act_quant=mode.act_quant,
                group_size=mode.group_size, mse_clip=mode.mse_clip))
        skey = "sa" if mode.act_quant else "s"
        leaf = {
            "q": jnp.stack([o["q"] for o in outs]),
            skey: jnp.stack([o[skey] for o in outs]),
        }
        if not stacked:
            leaf = {kk: v[0] for kk, v in leaf.items()}
        leaf.update(extra)
        return leaf

    leaf = _rtn_torch(tb if stacked else tb.squeeze(0), mode.act_quant,
                      mode.group_size, mse_clip=mode.mse_clip)
    leaf.update(extra)
    return leaf


def _slice_stat(a, blk, nd: int):
    """Per-block-range slice of a stat that may be stacked (nd+1 dims) or
    shared (nd dims): nd=1 for amean (K,), nd=2 for hessian (K, K)."""
    if a is None or blk is None:
        return a
    arr = np.asarray(a)
    return arr[blk] if arr.ndim == nd + 1 else arr


def mix_block_damage(params: Dict[str, Any], mode,
                     calib: Optional[Dict[str, Any]] = None) -> np.ndarray:
    """Per-block quantization damage estimate for '_mixN' block ranking.

    For every live (non-kept) quantized site, computes the
    calibration-weighted RTN error  Σ_k d_k · ‖ΔW_k‖²  per block, where
    d_k = diag(H)_k when the site has a captured Hessian, amean_k² when it
    has only mean|x| stats, and 1 otherwise (ΔW from plain RTN at the
    mode's group size — a ranking proxy; GPTQ shrinks but preserves the
    ordering of per-block damage).  Returns (nb,) float64."""
    import torch

    if isinstance(mode, str):
        mode = parse_quant_mode(mode)
    calib = calib or {}
    keep = set(mode.keep)
    nb = None
    damage = None
    for sub, names in QUANTIZED_BLOCK_WEIGHTS.items():
        for name in names:
            if name in keep or f"{sub}.{name}" in keep:
                continue
            t = _to_torch_f32(params["blocks"][sub][name])
            if t.ndim != 3:
                continue
            if nb is None:
                nb = t.shape[0]
                damage = np.zeros(nb, np.float64)
            k = t.shape[-2]
            gsz = mode.group_size if (mode.group_size
                                      and k % mode.group_size == 0) else None
            if gsz:
                tg = t.reshape(nb, k // gsz, gsz, -1)
                s = tg.abs().amax(dim=2, keepdim=True).clamp(min=1e-12) / 127
                dq = torch.round(tg / s).clamp(-127, 127) * s
                err2 = (dq - tg).pow_(2).reshape(nb, k, -1).sum(dim=-1)
            else:
                s = t.abs().amax(dim=1, keepdim=True).clamp(min=1e-12) / 127
                dq = torch.round(t / s).clamp(-127, 127) * s
                err2 = (dq - t).pow_(2).sum(dim=-1)  # (nb, K)
            site = LEAF_SITE.get(f"{sub}.{name}")
            h = calib.get("h", {}).get(site)
            am = calib.get("amean", {}).get(site)
            if h is not None:
                ha = np.asarray(h)
                d = (np.stack([np.diagonal(ha[i]) for i in range(nb)])
                     if ha.ndim == 3 else
                     np.broadcast_to(np.diagonal(ha), (nb, k)))
            elif am is not None:
                ama = np.asarray(am)
                d = (ama if ama.ndim == 2
                     else np.broadcast_to(ama, (nb, k))) ** 2
            else:
                d = np.ones((nb, k), np.float64)
            damage += (err2.numpy().astype(np.float64) * d).sum(axis=-1)
    if damage is None:
        raise ValueError("mix mode: no live stacked quantized leaves")
    return damage


def _mix_bf16_set(params, mode, calib, nb: int) -> frozenset:
    """Indices of the mix_blocks blocks that stay bf16: damage-ranked when
    any calibration stats exist, boundary blocks (first/last) otherwise."""
    n = min(mode.mix_blocks, nb)
    if calib and (calib.get("h") or calib.get("amean")):
        order = np.argsort(mix_block_damage(params, mode, calib))[::-1]
        return frozenset(int(i) for i in order[:n])
    half = (n + 1) // 2
    return frozenset(range(half)) | frozenset(range(nb - (n - half), nb))


def _quantize_block_stack(params, mode, keep, ameans, hs,
                          blk: Optional[slice] = None) -> Dict[str, Any]:
    """Quantize the stacked block weights (optionally a [start:stop) slice
    of the block axis) per the QuantMode; bf16 leaves pass through."""
    blocks: Dict[str, Any] = {}
    for sub, names in QUANTIZED_BLOCK_WEIGHTS.items():
        bp = {k: jnp.asarray(v if blk is None else v[blk])
              for k, v in params["blocks"][sub].items() if k not in names}
        for name in names:
            src = params["blocks"][sub][name]
            if blk is not None and np.ndim(src) == 3:
                src = src[blk]
            if name in keep or f"{sub}.{name}" in keep:
                bp[name] = jnp.asarray(src)
                continue
            site = LEAF_SITE.get(f"{sub}.{name}")
            amean = _slice_stat(ameans.get(site), blk, 1)
            hess = _slice_stat(hs.get(site), blk, 2) if mode.gptq else None
            if mode.needs_calibration and site is not None:
                if mode.awq and amean is None:
                    raise ValueError(
                        f"quant mode requires calibration: no amean stats "
                        f"for site {site!r} ({sub}.{name}) — run "
                        f"models/calibrate.capture_dit_stats first")
                if (mode.gptq and hess is None
                        and site in ("fa.qkv", "fa.wo", "mlp.w1")):
                    # The big token-fed sites must not silently lose their
                    # error compensation; the (B,1,·) cross-attention sites
                    # see only B samples (a useless rank-B Hessian) and
                    # mlp.w2's 16384² H is 1 GiB/block — both fall back to
                    # RTN(+transforms) by design.
                    raise ValueError(
                        f"gptq mode: no hessian for site {site!r} "
                        f"({sub}.{name}); capture with hessian_sites= or "
                        f"keep_bf16 this matmul")
            bp[name] = quantize_leaf_host(src, mode, amean=amean,
                                          hessian=hess)
        blocks[sub] = bp
    return blocks


def _bf16_block_stack(params, blk: slice) -> Dict[str, Any]:
    return {sub: {k: jnp.asarray(v[blk] if np.ndim(v) >= 1 else v)
                  for k, v in params["blocks"][sub].items()}
            for sub in params["blocks"]}


def quantize_dit_params_host(params: Dict[str, Any], mode,
                             calib: Optional[Dict[str, Any]] = None,
                             keep_bf16: Iterable[str] = ()) -> Dict[str, Any]:
    """Host-side pytree quantization for any QuantMode (or mode string),
    including the calibrated quantizers.  Non-quantized leaves are uploaded
    as-is (jnp.asarray); use this instead of quantize_dit_params when the
    params pytree lives on host (checkpoint conversion, the PSNR harness) —
    the device has no room for bf16+int8 copies of the 7B weights.

    calib: capture output of models/calibrate.capture_dit_stats —
    {"amean": {site: (nb, K)}, "h": {site: (nb, K, K)}}.  Required for
    awq/gptq modes (raises if a live quantized site has no stats).

    '_mixN' modes return params["blocks"] as a TUPLE of stacked segments
    (bf16 segments for the N highest-damage blocks, quantized segments for
    the rest, in block order) — dit_forward runs one lax.scan per segment;
    the pipeline-parallel executor does not support mixed segments."""
    if isinstance(mode, str):
        mode = parse_quant_mode(mode)
    keep = set(keep_bf16) | set(mode.keep)
    calib = calib or {}
    ameans = calib.get("amean", {})
    hs = calib.get("h", {})
    out = {k: (v if k == "blocks" else jax.tree.map(jnp.asarray, v))
           for k, v in params.items()}
    if mode.mix_blocks:
        nb = jax.tree_util.tree_leaves(params["blocks"])[0].shape[0]
        bf16_set = _mix_bf16_set(params, mode, calib, nb)
        segs = []
        start = 0
        for b in range(nb + 1):
            boundary = b == nb or ((b in bf16_set) != (start in bf16_set))
            if not boundary:
                continue
            blk = slice(start, b)
            segs.append(_bf16_block_stack(params, blk)
                        if start in bf16_set else
                        _quantize_block_stack(params, mode, keep, ameans,
                                              hs, blk))
            start = b
        out["blocks"] = tuple(segs)
        return out
    out["blocks"] = _quantize_block_stack(params, mode, keep, ameans, hs)
    return out


# Above this many tokens the XLA per-channel W8A8 path's L-sized int8/int32
# temporaries become the single-chip OOM risk (measured round 2: +2.06 GiB
# program temp at 56,320 tokens, which tipped the 121-frame job over HBM) —
# the fused kernel keeps the int32 result in VMEM scratch.  Round 5 measured
# the whole 33k-50k band (scripts/bench_quant_matmul.py at M = 33792, 39424,
# 45056, 50688): there is NO time-crossover — XLA per-channel stays faster
# at the MLP shapes everywhere in-band (kernel/xla 1.05-1.19x at MLP-up,
# 0.93-1.08x at MLP-down; at the threshold itself, M=45056: 1.11x / 1.05x).
# This constant is therefore a MEMORY boundary, not a perf crossover: it
# sits above the largest time-preferred workload (flagship 28,160 tokens,
# where XLA is ~13% faster and fits with >5 GiB to spare) and below the
# regime where the XLA path's L-scaled temps tip the denoise program over
# HBM next to the 6.74 GiB weights (56,320 tokens: 8.19 GiB temp, OOM).
# Crossing at 45k pays a measured <=11% per-matmul time tax as OOM
# insurance for the 45k-56k frame counts nobody has measured end-to-end.
_KERNEL_MIN_TOKENS_PER_CHANNEL = 45_000


def _use_fused_kernel(x: jax.Array, w: Dict[str, jax.Array]) -> bool:
    """Route W8A8 matmuls through the fused Pallas kernel on TPU when
    measurement says it wins (table in BASELINE.md, round 4):

    * GROUPED scales: always (when the shape is kernel-legal).  The XLA
      grouped path materializes an fp32 (G, N, L) partial — 59 GB at the
      flagship MLP-up shape, a compile-time OOM — and even where it fits it
      measured 2.4x slower.  The kernel is the only viable grouped path.
    * PER-CHANNEL scales: only in the long-video memory regime
      (>= _KERNEL_MIN_TOKENS_PER_CHANNEL tokens); at flagship token counts
      XLA per-channel measured ~13% faster at the MLP shapes.

    Tiny matmuls (the B-sized CA projections), CPU tests, and active-mesh
    (multi-chip) calls keep the XLA path."""
    if jax.devices()[0].platform != "tpu":
        return False
    try:
        from jax.interpreters import pxla

        if not pxla.thread_resources.env.physical_mesh.empty:
            # Under an active mesh (multi-chip generate): a pallas_call is
            # not auto-partitionable by SPMD — keep the XLA path, which
            # partitions cleanly under the Megatron shardings.  Memory is
            # safe there even in the long-video regime that motivated this
            # kernel: per-chip L shrinks with `seq`, and the deviceless
            # v5e AOT memory_analysis (scripts/mem_w8a8_mesh.py, round 5)
            # measured the 121-frame 56,320-token denoise at seq=8 at
            # 1.40 GiB per-chip temp / 8.01 GiB peak(temp+args) for w8a8
            # (2.25 / 9.03 GiB for w8a8_g128) vs 8.19 GiB temp single-chip
            # (round 4) — comfortably inside a 16 GiB v5e.  Executability
            # of this path is covered by the quantized sharded-generate
            # leg in __graft_entry__.dryrun_multichip (max uint8 delta 0).
            return False
    except Exception:
        pass
    k, n = w["q"].shape[-2], w["q"].shape[-1]
    m = 1
    for s in x.shape[:-1]:
        m *= s
    if m < 512 or k % 512 != 0 or n % 512 != 0:
        return False
    if _is_grouped(w):
        gsz = k // _wscale(w).shape[-2]
        # Kernel group constraints: gsz multiple of 128, and either a
        # multiple or a divisor of the k tile (512).
        return gsz % 128 == 0 and (gsz % 512 == 0 or 512 % gsz == 0)
    return m >= _KERNEL_MIN_TOKENS_PER_CHANNEL


def _quantize_activation(x: jax.Array):
    """Per-token symmetric int8: returns (x_q int8, dequant fp32 per token).

    The quantize multiply runs in x.dtype (bf16) — an fp32 quotient would
    materialize a 2x-sized transient at flagship activation shapes — and the
    dequant uses the EXACT inverse of the bf16 scale actually applied, so
    the rounding of the scale itself cancels."""
    amax = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1, keepdims=True)
    inv = (127.0 / jnp.maximum(amax, 1e-12)).astype(x.dtype)
    xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    return xq, 1.0 / inv.astype(jnp.float32)


def dense_maybe_quantized(x: jax.Array, w: Any) -> jax.Array:
    """x @ w supporting bf16, {'q','s'} weight-only int8, or {'q','sa'} W8A8
    weights (each per-channel or per-group scaled); fp32 (or int32)
    accumulation.

    Routing-dependent numerics (ADVICE r3): the fused kernel path quantizes
    the fp32 activation product while this module's XLA fallback rounds the
    product to bf16 first, so single-chip flagship shapes (kernel) and
    multi-chip / small shapes (XLA) may differ by +-1 int8 activation code on
    ~9% of entries.  Multi-chip-vs-single-chip parity checks must therefore
    compare with activation-quantization-noise tolerance, not exactly
    (see ops/quant_matmul.py docstring for the bound)."""
    if not is_quantized(w):
        return jnp.einsum(
            "...i,io->...o", x, w, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    # Convert-time input-space transforms (exact identities; the weight was
    # transformed by the inverse at quantization time): AWQ/SmoothQuant
    # per-channel migration, then block-Hadamard rotation.  Both are
    # elementwise/tiny-matmul pre-passes XLA fuses into the activation read.
    if "di" in w:
        x = x * w["di"].astype(x.dtype)
    if "hs" in w:
        x = hadamard_rotate(x, w["hs"])
    grouped = _is_grouped(w)
    if "sa" in w:
        if _use_fused_kernel(x, w):
            # Fused Pallas path (TPU, big shapes): activation quantize +
            # int8 dot + group-scale folds inside the tile loop — no
            # L-sized int8/int32 temporaries in HBM (NOTES item 7), and
            # the only per-group-scale implementation that doesn't
            # materialize a (..., G, out) partial.
            from ..ops.quant_matmul import quant_matmul_w8a8

            return quant_matmul_w8a8(x, w["q"], w["sa"])
        xq, dequant = _quantize_activation(x)
        if grouped:
            # Per-group int8 dots, int32-accumulated within each group (max
            # |sum| <= 127*127*g << 2^31), fp32 scale-fold across groups.
            # XLA path: scans over groups with one (..., out) fp32
            # accumulator — an einsum producing the (..., G, out) partial is
            # 59 GB at the flagship MLP-up shape (measured compile-time OOM,
            # round 4), and this fallback must stay viable under multi-chip
            # meshes where the Pallas kernel doesn't route.
            #
            # On single-chip TPU this branch only fires when the group size
            # is kernel-illegal (gsz below the 128-lane alignment minimum,
            # e.g. g32): measured round 4 at the flagship shape, the scan is
            # ~10x slower than per-channel (39.1 s/step w8a8_g32_keepres)
            # and one attempt crashed the tunnel TPU worker.  g32 is a
            # weight-only deployment mode (fused dequant); warn loudly at
            # trace time so a misconfigured job is diagnosable.
            import math as _math
            import warnings

            _m = _math.prod(x.shape[:-1])
            if _m >= 8192 and jax.devices()[0].platform == "tpu":
                warnings.warn(
                    f"grouped W8A8 matmul ({x.shape} @ {w['q'].shape}, "
                    f"group size {w['q'].shape[-2] // w['sa'].shape[-2]}) is "
                    "taking the XLA group-scan fallback on TPU — measured "
                    "~10x slower than per-channel at flagship scale. Use a "
                    "group size >= 128 (fused kernel) or weight-only int8 "
                    "for small groups (see BASELINE.md rung step times).",
                    stacklevel=2,
                )
            k = xq.shape[-1]
            n = w["q"].shape[-1]
            g = w["sa"].shape[-2]
            xg = jnp.moveaxis(xq.reshape(*xq.shape[:-1], g, k // g), -2, 0)
            wg = w["q"].reshape(g, k // g, n)
            sg = jnp.moveaxis(w["sa"], -2, 0)

            def _fold(acc, gi):
                xq_i, wq_i, s_i = gi
                part = jnp.einsum("...k,ko->...o", xq_i, wq_i,
                                  preferred_element_type=jnp.int32)
                return acc + part.astype(jnp.float32) * s_i, None

            acc0 = jnp.zeros((*xq.shape[:-1], n), jnp.float32)
            y, _ = jax.lax.scan(_fold, acc0, (xg, wg, sg))
            return (y * dequant).astype(x.dtype)
        y = jnp.einsum("...i,io->...o", xq, w["q"],
                       preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * dequant * w["sa"]).astype(x.dtype)
    if grouped:
        # Weight-only grouped: dequant rides the matmul operand read (the
        # group-scale multiply fuses into the int8->bf16 convert).  Verified
        # by memory_analysis round 4 (scripts/mem_w8a8_longvideo.py w8_g128
        # at 56,320 tokens): program temp 6.06 GiB grouped vs 6.13 GiB
        # per-channel — no materialized full-size bf16 weight copy.
        y = jnp.einsum(
            "...i,io->...o", x, dequantize_tensor(w, x.dtype),
            preferred_element_type=jnp.float32,
        )
        return y.astype(x.dtype)
    y = jnp.einsum(
        "...i,io->...o", x, w["q"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return (y * w["s"]).astype(x.dtype)
