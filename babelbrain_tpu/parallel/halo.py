"""Domain-decomposition communicator for stencil codes.

The FDTD grid is sharded along its first (x) axis — and optionally also its
second (y) axis — over a 1-D or 2-D device mesh; each step exchanges 2-plane
halos (the 4th-order stencil depth) with neighbors via ``lax.ppermute`` over
ICI. The reference has no multi-device story at all (SURVEY.md section 2.8)
— its closest analogue is Z-slab chunking through limited GPU memory
(`GPUFunctions/GPUUtils.py:23-82`).

``DomainComm`` abstracts the halo so the same step function runs single
device (zero ghost cells) and sharded (``ppermute`` ghost cells): global-edge
shards receive zeros from the non-existent neighbor, which matches the
implicit zero boundary of the unsharded stencil.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _exchange(f, axis, axis_name, n_shards, h):
    """Concatenate ppermute'd neighbor planes along ``axis``.

    Global-edge shards receive zeros (matching the unsharded zero-padded
    stencil boundary, which the PML then owns).
    """
    sl_hi = [slice(None)] * f.ndim
    sl_hi[axis] = slice(f.shape[axis] - h, f.shape[axis])
    sl_lo = [slice(None)] * f.ndim
    sl_lo[axis] = slice(0, h)
    from_left = lax.ppermute(
        f[tuple(sl_hi)], axis_name, [(i, i + 1) for i in range(n_shards - 1)]
    )
    from_right = lax.ppermute(
        f[tuple(sl_lo)], axis_name, [(i + 1, i) for i in range(n_shards - 1)]
    )
    return jnp.concatenate([from_left, f, from_right], axis=axis)


class DomainComm:
    """Halo exchange + edge masks along the x (first) and y (second) axes.

    axis_name=None means single-device along x (ghost cells are zeros);
    axis_name_y=None likewise for y. Otherwise the instance must be used
    inside ``shard_map`` with those mesh axes.
    """

    def __init__(
        self,
        axis_name: str | None = None,
        n_shards: int = 1,
        halo: int = 2,
        axis_name_y: str | None = None,
        n_shards_y: int = 1,
    ):
        self.axis_name = axis_name
        self.n_shards = n_shards
        self.halo = halo
        self.axis_name_y = axis_name_y
        self.n_shards_y = n_shards_y

    @property
    def sharded_x(self) -> bool:
        return self.axis_name is not None and self.n_shards > 1

    @property
    def sharded_y(self) -> bool:
        return self.axis_name_y is not None and self.n_shards_y > 1

    def pad_x(self, f):
        """Return f extended with `halo` ghost planes on both x sides."""
        h = self.halo
        if not self.sharded_x:
            pad = [(h, h)] + [(0, 0)] * (f.ndim - 1)
            return jnp.pad(f, pad)
        return _exchange(f, 0, self.axis_name, self.n_shards, h)

    def pad_y(self, f):
        """Return f extended with `halo` ghost planes on both y sides."""
        h = self.halo
        if not self.sharded_y:
            pad = [(0, 0), (h, h)] + [(0, 0)] * (f.ndim - 2)
            return jnp.pad(f, pad)
        return _exchange(f, 1, self.axis_name_y, self.n_shards_y, h)

    def crop_x(self, f):
        h = self.halo
        return f[h:-h]

    def crop_y(self, f):
        h = self.halo
        return f[:, h:-h]

    def edge_masks(self):
        """(is_first, is_last) as f32 scalars for masking x-PML slabs."""
        if not self.sharded_x:
            return jnp.float32(1.0), jnp.float32(1.0)
        idx = lax.axis_index(self.axis_name)
        return (
            (idx == 0).astype(jnp.float32),
            (idx == self.n_shards - 1).astype(jnp.float32),
        )

    def edge_masks_y(self):
        """(is_first, is_last) as f32 scalars for masking y-PML slabs."""
        if not self.sharded_y:
            return jnp.float32(1.0), jnp.float32(1.0)
        idx = lax.axis_index(self.axis_name_y)
        return (
            (idx == 0).astype(jnp.float32),
            (idx == self.n_shards_y - 1).astype(jnp.float32),
        )

    def local_x_offset(self, n_local: int):
        """Global x index of this shard's first plane."""
        if not self.sharded_x:
            return jnp.int32(0)
        return lax.axis_index(self.axis_name) * n_local

    def local_y_offset(self, n_local: int):
        """Global y index of this shard's first plane."""
        if not self.sharded_y:
            return jnp.int32(0)
        return lax.axis_index(self.axis_name_y) * n_local

    def axis_names(self) -> tuple:
        """Mesh axis names this communicator is sharded over."""
        names = []
        if self.sharded_x:
            names.append(self.axis_name)
        if self.sharded_y:
            names.append(self.axis_name_y)
        return tuple(names)

    def psum(self, x):
        names = self.axis_names()
        if not names:
            return x
        return lax.psum(x, names)

    def ghosts(self, f, halo: int | None = None):
        """(from_left, from_right) x-axis ghost plane blocks for array ``f``.

        from_left = the left neighbor's top `halo` planes (zeros on the
        first shard); from_right = the right neighbor's bottom planes.
        """
        h = halo if halo is not None else self.halo
        if not self.sharded_x:
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


def make_mesh_2d(nx: int, ny: int):
    """2-D (x, y) device mesh for plane decomposition of the FDTD grid."""
    import numpy as np

    devs = np.asarray(jax.devices()[: nx * ny]).reshape(nx, ny)
    return jax.sharding.Mesh(devs, ("x", "y"))


def mesh_axis_sizes(mesh) -> tuple:
    """(n_x, n_y) shard counts of a 1-D or 2-D FDTD mesh."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    return sizes.get("x", 1), sizes.get("y", 1)
