"""Domain-decomposition communicator for stencil codes.

The FDTD grid is sharded along its first (x) axis over a 1-D device mesh;
each step exchanges 2-plane halos (the 4th-order stencil depth) with
neighbors via ``lax.ppermute`` over ICI. The reference has no multi-device
story at all (SURVEY.md section 2.8) — its closest analogue is Z-slab
chunking through limited GPU memory (`GPUFunctions/GPUUtils.py:23-82`).

``DomainComm`` abstracts the halo so the same step function runs single
device (zero ghost cells) and sharded (``ppermute`` ghost cells): global-edge
shards receive zeros from the non-existent neighbor, which matches the
implicit zero boundary of the unsharded stencil.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


class DomainComm:
    """Halo exchange + edge masks along the x (first) axis.

    axis_name=None means single-device (ghost cells are zeros). Otherwise the
    instance must be used inside ``shard_map`` with that mesh axis.
    """

    def __init__(self, axis_name: str | None = None, n_shards: int = 1, halo: int = 2):
        self.axis_name = axis_name
        self.n_shards = n_shards
        self.halo = halo

    def pad_x(self, f):
        """Return f extended with `halo` ghost planes on both x sides."""
        h = self.halo
        if self.axis_name is None or self.n_shards == 1:
            pad = [(h, h)] + [(0, 0)] * (f.ndim - 1)
            return jnp.pad(f, pad)
        n = self.n_shards
        # my top planes -> right neighbor's ghost-lo; my bottom -> left's ghost-hi
        from_left = lax.ppermute(
            f[-h:], self.axis_name, [(i, i + 1) for i in range(n - 1)]
        )
        from_right = lax.ppermute(
            f[:h], self.axis_name, [(i + 1, i) for i in range(n - 1)]
        )
        return jnp.concatenate([from_left, f, from_right], axis=0)

    def crop_x(self, f):
        h = self.halo
        return f[h:-h]

    def edge_masks(self):
        """(is_first, is_last) as f32 scalars for masking x-PML slabs."""
        if self.axis_name is None or self.n_shards == 1:
            return jnp.float32(1.0), jnp.float32(1.0)
        idx = lax.axis_index(self.axis_name)
        return (
            (idx == 0).astype(jnp.float32),
            (idx == self.n_shards - 1).astype(jnp.float32),
        )

    def local_x_offset(self, n_local: int):
        """Global x index of this shard's first plane."""
        if self.axis_name is None or self.n_shards == 1:
            return jnp.int32(0)
        return lax.axis_index(self.axis_name) * n_local

    def psum(self, x):
        if self.axis_name is None or self.n_shards == 1:
            return x
        return lax.psum(x, self.axis_name)

    def ghosts(self, f, halo: int | None = None):
        """(from_left, from_right) ghost plane blocks for array ``f``.

        from_left = the left neighbor's top `halo` planes (zeros on the
        first shard); from_right = the right neighbor's bottom planes.
        """
        h = halo if halo is not None else self.halo
        if self.axis_name is None or self.n_shards == 1:
            z = jnp.zeros((h,) + f.shape[1:], f.dtype)
            return z, z
        n = self.n_shards
        from_left = lax.ppermute(
            f[-h:], self.axis_name, [(i, i + 1) for i in range(n - 1)]
        )
        from_right = lax.ppermute(
            f[:h], self.axis_name, [(i + 1, i) for i in range(n - 1)]
        )
        return from_left, from_right


def make_mesh(n_devices: int | None = None, axis: str = "x"):
    """1-D device mesh over available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.sharding.Mesh(devs, (axis,))
