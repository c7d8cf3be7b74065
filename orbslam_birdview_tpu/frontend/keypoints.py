"""Fixed-capacity keypoint/descriptor containers.

Dynamic keypoint counts are the core TPU-hostility of the reference design
(`/root/reference/src/ORBextractor.cc` emits std::vectors). Here every frame
produces exactly `capacity` slots with a validity mask; downstream ops are
masked, never ragged.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Keypoints(NamedTuple):
    """A padded batch of keypoints for one image.

    xy:        (K, 2) float32 — level-0 pixel coords (x=col, y=row)
    response:  (K,)  float32 — detector response (−inf for padding)
    angle:     (K,)  float32 — orientation in radians [0, 2π)
    octave:    (K,)  int32   — pyramid level
    valid:     (K,)  bool
    desc_u8:   (K, 32) uint8 — 256-bit BRIEF, OpenCV byte/bit order
    desc_pm1:  (K, 256) int8 — same bits as ±1 vector (MXU matching)
    """

    xy: jnp.ndarray
    response: jnp.ndarray
    angle: jnp.ndarray
    octave: jnp.ndarray
    valid: jnp.ndarray
    desc_u8: jnp.ndarray
    desc_pm1: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def unpack_bits_to_pm1(desc_u8):
    """(…,32) uint8 -> (…,256) int8 in {−1,+1} (bit k of byte j -> idx 8j+k)."""
    bits = jnp.unpackbits(desc_u8, axis=-1, bitorder="little")
    return (bits.astype(jnp.int8) * 2 - 1).astype(jnp.int8)


def pack_pm1_to_bits(pm1):
    bits = (pm1 > 0).astype(jnp.uint8)
    return jnp.packbits(bits, axis=-1, bitorder="little")
