"""Lossless host->device wire codec for grayscale window batches.

The pipeline's uplink payload is the uint8 gray chimney crop (the reference
ships nothing — it is single-process; this layer exists because a TPU host
link, a network camera hop, or this rig's ~36 MB/s tunnel can all make the
transfer the bottleneck long before the chip is busy).  Consecutive frames
of surveillance video differ by sensor noise plus a few moving birds, so the
temporal delta stream has ~2-3 bits/pixel of entropy; this codec ships it
at 4 bits/pixel fixed rate, bit-lossless:

  host encode (numpy, in the prefetch thread):
    residual r_t = (x_t - x_{t-1}) mod 256 over the flattened (B*T) frame
    sequence; residuals whose centered value lies in [-7, 7] become one
    nibble (value 0..14); the rest escape (nibble 15) and ship their raw
    mod-256 residual byte in a sparse (index, value) side stream.  Frame 0
    ships raw (each batch is self-contained — no cross-batch device state).

  device decode (pure XLA, fused ahead of the localization program):
    nibble unpack -> scatter the escape values -> uint8 cumulative sum over
    the frame axis (mod-256 wraparound is exactly uint8 overflow), add the
    raw first frame.  All elementwise/scan work on ~1/2 the raw bytes.

Wire size: H*W/2 bytes per frame + 5 bytes per escape + one raw frame per
batch — ~2x fewer bytes than raw uint8 on realistic noise (sigma ~1-2 gray
levels).  Lossless for ARBITRARY uint8 input (worst case the escape stream
overflows `escape_cap` and `encode_delta4` returns None; the caller ships
raw — correctness never depends on the content).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class WirePacket:
    """Encoded gray window batch (host numpy or device arrays)."""

    first: np.ndarray      # (H, W) uint8 — frame 0, raw
    packed: np.ndarray     # (ceil((N-1)*H*W / 2),) uint8 — 2 nibbles/byte
    esc_idx: np.ndarray    # (escape_cap,) int32 — flat residual indices,
    #                        padded with M (out of range => dropped scatter)
    esc_val: np.ndarray    # (escape_cap,) uint8 — raw mod-256 residuals
    shape: Tuple[int, int, int]  # (N, H, W) of the decoded batch

    @property
    def nbytes(self) -> int:
        return (
            self.first.nbytes + self.packed.nbytes
            + self.esc_idx.nbytes + self.esc_val.nbytes
        )


_NIB_BIAS = 7          # nibble = centered residual + 7, values 0..14
_NIB_ESCAPE = 15


def encode_delta4(gray: np.ndarray, escape_cap: int) -> Optional[WirePacket]:
    """Encode an (N, H, W) uint8 frame stack; None if escapes exceed cap.

    Pure numpy, intended for the prefetch worker thread (overlaps the
    in-flight upload of the previous batch)."""
    N, H, W = gray.shape
    if N < 2:
        return None
    flat = gray.reshape(N, H * W)
    if flat.flags.c_contiguous:
        from . import native as _native

        if _native.is_available():      # threaded C twin, bit-identical
            enc = _native.encode_delta4(flat, escape_cap)
            if enc is None:
                return None
            packed, esc_idx, esc_val = enc
            return WirePacket(
                first=np.ascontiguousarray(gray[0]),
                packed=packed,
                esc_idx=esc_idx,
                esc_val=esc_val,
                shape=(N, H, W),
            )
    delta = flat[1:] - flat[:-1]                     # uint8 wraparound
    # centered residual in [-7, 7] <=> (delta + 7) mod 256 in [0, 14], so the
    # whole nibble map stays in uint8: values > 14 are escapes, clamped to 15
    nib0 = delta + np.uint8(_NIB_BIAS)
    esc = nib0 > 14
    n_esc = int(np.count_nonzero(esc))
    if n_esc > escape_cap:
        return None
    flatn = np.minimum(nib0, np.uint8(_NIB_ESCAPE)).reshape(-1)
    M = flatn.size
    if M % 2:
        flatn = np.append(flatn, np.uint8(0))
    pairs = flatn.reshape(-1, 2)
    packed = pairs[:, 0] | (pairs[:, 1] << 4)
    idx = np.full(escape_cap, M, np.int32)           # M = out of range = drop
    val = np.zeros(escape_cap, np.uint8)
    if n_esc:
        where = np.flatnonzero(esc).astype(np.int32)
        idx[:n_esc] = where
        val[:n_esc] = delta.reshape(-1)[where]
    return WirePacket(
        first=np.ascontiguousarray(gray[0]),
        packed=packed,
        esc_idx=idx,
        esc_val=val,
        shape=(N, H, W),
    )


@functools.partial(jax.jit, static_argnames=("N", "H", "W"))
def decode_delta4(
    first: jnp.ndarray,
    packed: jnp.ndarray,
    esc_idx: jnp.ndarray,
    esc_val: jnp.ndarray,
    N: int,
    H: int,
    W: int,
) -> jnp.ndarray:
    """Device inverse of encode_delta4 -> (N, H, W) uint8 (bit-lossless)."""
    M = (N - 1) * H * W
    lo = packed & jnp.uint8(15)
    hi = packed >> 4
    nib = jnp.stack([lo, hi], axis=-1).reshape(-1)[:M]
    # nibble - 7 mod 256 == nibble + 249 under uint8 wraparound
    res = jnp.where(nib == _NIB_ESCAPE, jnp.uint8(0), nib + jnp.uint8(249))
    res = res.at[esc_idx].set(esc_val, mode="drop")
    # mod-256 prefix sum == uint8 cumulative sum (overflow wraps)
    csum = jnp.cumsum(res.reshape(N - 1, H * W), axis=0, dtype=jnp.uint8)
    f0 = first.reshape(1, H * W)
    return jnp.concatenate([f0, f0 + csum], axis=0).reshape(N, H, W)


def device_put_packet(pkt: WirePacket) -> WirePacket:
    """Start the async upload of a packet's arrays (prefetch thread)."""
    first, packed, idx, val = jax.device_put(
        (pkt.first, pkt.packed, pkt.esc_idx, pkt.esc_val)
    )
    return WirePacket(first, packed, idx, val, pkt.shape)
