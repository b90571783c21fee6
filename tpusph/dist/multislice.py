"""Multi-slice (DCN) topology — scaling the sharded engine past one ICI
domain (SURVEY.md §2.5.3 "DCN for multi-slice later").

A TPU pod slice is an ICI-connected device block; multiple slices connect
only over the data-center network (DCN: ~10× lower bandwidth, ~10× higher
latency than ICI). The z-slab decomposition (tpusph/dist/sharded.py) is
already DCN-friendly: every collective it issues is a ±1-hop `ppermute`
along the one mesh axis (halo rounds + migration — there are no global
collectives in the step), so the cross-slice traffic is exactly the slab
faces that sit on a slice boundary.

What this module adds is the TOPOLOGY layer that makes that true on a real
multi-slice deployment:

  * `make_multislice_mesh` orders devices SLICE-MAJOR (grouped by
    `device.slice_index`, jax's attribute on multi-slice platforms) before
    building the 1-D mesh. With that order, the ±1-hop ppermute crosses the
    DCN on exactly `n_slices − 1` of its `D − 1` links — one slab-face
    exchange (O(face area) bytes) per slice pair per round — while every
    other hop rides ICI. An interleaved order would put O(D) hops on DCN.
  * `dcn_boundary_pairs` exposes which mesh hops ride DCN, and
    `halo_bytes_per_boundary` the per-step DCN payload (the ONE 2h halo
    round + migration), so capacity planning/diagnostics can reason about
    the DCN budget explicitly.

The step code itself is topology-agnostic (the same `make_sharded_step` /
`make_sharded_run` run unchanged over the returned mesh); XLA routes each
ppermute hop over ICI or DCN from the device assignment. Real multi-slice
hardware is not reachable from this host — the layer is validated on a
virtual CPU mesh (tests/test_multislice.py): slice-major ordering, boundary
accounting, and step-equality with the single-device engine.

The reference has no distributed layer at all (SURVEY.md §2.5: single GPU,
one CUDA thread per particle — /root/reference/src/simulator.cu:163-185);
this is part of the TPU-native scaling plan replacing it.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class SliceTopology:
    """A 1-D z-slab mesh plus its slice structure: `slice_of[i]` is the
    slice index of the device at mesh position i (non-decreasing — the
    mesh is slice-major)."""

    mesh: Mesh
    slice_of: tuple[int, ...]

    @property
    def n_slices(self) -> int:
        return len(set(self.slice_of))

    def dcn_boundary_pairs(self) -> list[tuple[int, int]]:
        """Mesh-position pairs (i, i+1) whose ±1-hop ppermute crosses a
        slice boundary (rides DCN). Slice-major ordering makes this exactly
        n_slices − 1 of the D − 1 links."""
        return [
            (i, i + 1)
            for i in range(len(self.slice_of) - 1)
            if self.slice_of[i] != self.slice_of[i + 1]
        ]


def _slice_index(device) -> int:
    """Device → slice id: `slice_index` on multi-slice TPU platforms, 0
    elsewhere (single slice / CPU)."""
    return getattr(device, "slice_index", 0) or 0


def make_multislice_mesh(
    devices=None,
    n_slices: int | None = None,
    axis_name: str = "z",
) -> SliceTopology:
    """Build the 1-D z-slab mesh with SLICE-MAJOR device order.

    devices: defaults to jax.devices(). Stable-sorted by slice index, so
    within a slice jax's enumeration order (ICI-contiguous on real
    hardware) is preserved.
    n_slices: synthetic slicing override for platforms that report a single
    slice (CPU validation, forced topologies): devices are grouped into
    n_slices contiguous equal blocks. Ignored when the devices already
    report distinct slice_index values."""
    devices = list(devices) if devices is not None else jax.devices()
    slice_ids = [_slice_index(d) for d in devices]
    if len(set(slice_ids)) == 1 and n_slices is not None:
        if len(devices) % n_slices:
            raise ValueError(
                f"{len(devices)} devices do not split into {n_slices} slices"
            )
        per = len(devices) // n_slices
        slice_ids = [i // per for i in range(len(devices))]
    order = sorted(range(len(devices)), key=lambda i: slice_ids[i])  # stable
    mesh = Mesh(np.array([devices[i] for i in order]), (axis_name,))
    return SliceTopology(
        mesh=mesh, slice_of=tuple(slice_ids[i] for i in order)
    )


HALO_ROW_BYTES = 6 * 4 + 1  # pos+vel (6·f32) + valid (1-byte pred)
MIGRATION_ROW_BYTES = 6 * 4 + 4 + 1  # pos+vel + pid tag (i32) + valid


def halo_bytes_per_boundary(halo_capacity: int, migration_capacity: int) -> int:
    """Per-step worst-case DCN payload of ONE slice boundary, per direction,
    for the one-round 2h ghost-layer step (dist/sharded.py): the single halo
    exchange sends position+velocity+valid (6·f32 + 1-byte pred = 25 B/row);
    migration sends pos+vel+pid-tag+valid (29 B/row). There is no second
    ρ/p round — the 2h layer makes halo densities locally exact. Buffers are
    fixed-capacity, so this is the static bound the DCN budget must cover
    (tests/test_multislice.py checks it against the step's actual ppermute
    operand shapes so it cannot drift from the implementation)."""
    return (
        halo_capacity * HALO_ROW_BYTES
        + migration_capacity * MIGRATION_ROW_BYTES
    )
