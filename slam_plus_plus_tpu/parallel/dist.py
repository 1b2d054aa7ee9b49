"""Distributed (multi-chip) lambda/eta assembly over a device mesh.

The reference is single-process (SURVEY.md P6: no MPI/NCCL anywhere in its
tree); this is the new capability the TPU build adds.  Design:

  * edges are the data-parallel axis: each device holds a 1/n slice of every
    edge type's arrays (measurements, informations, slot indices, segment
    ids) — the analogue of the reference's OpenMP ``For_Each_Parallel`` over
    edge pools (reference include/slam/FlatSystem.h:932), scaled across chips;
  * every shard computes its partial block sums with the same batched
    kernels + ``segment_sum`` used on one chip, then one ``psum`` over the
    mesh reduces lambda/eta into replicated arrays — collectives ride ICI;
  * the (small, replicated) solve runs identically on every device, so no
    gather is needed before the vertex update.

Padding: edge counts are padded to a multiple of the mesh size with zero
*information* matrices — padded edges contribute exactly zero to every sum
(their H = J^T 0 J) while keeping gathers in-bounds (slot ids clamp to 0).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from slam_plus_plus_tpu.assembly.assembler import Assembler, BlockSystem


def make_edge_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the edge-parallel axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("edges",))


def _pad_to(x: jnp.ndarray, n: int, fill=0):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=fill)


class DistributedAssembler(Assembler):
    """Assembler whose numeric phase shards edges over a mesh.

    Drop-in replacement: ``assemble``/``chi2`` run under ``shard_map`` with a
    ``psum`` reduction; the BlockSystem it returns is replicated.
    """

    def __init__(self, system, mesh: Mesh, config=None, dtype=None):
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        super().__init__(system, config, dtype)
        # shard-local contribution chunks are partial sums: the permutation-
        # gather shortcut does not apply (psum completes the reduction)
        self._pp_gather = False
        self._pl_gather = False
        self._shard_edge_data()
        in_specs = (P(), self._edge_specs)
        self._assemble_jit = jax.jit(
            jax.shard_map(self._dist_sums, mesh=mesh,
                          in_specs=in_specs, out_specs=P(),
                          check_vma=False))
        self._chi2_dist_jit = jax.jit(
            jax.shard_map(self._dist_chi2, mesh=mesh,
                          in_specs=in_specs, out_specs=P(),
                          check_vma=False))
        self._finalize_jit = jax.jit(self._finalize)

    def _shard_edge_data(self):
        """Pad edge arrays to a multiple of the mesh size (zero-information
        padding) and record their PartitionSpecs."""
        n = self.n_shards
        new_data = {}
        specs = {}
        for name, data in self.edge_data.items():
            E = data["z"].shape[0]
            Epad = ((E + n - 1) // n) * n
            new_data[name] = dict(
                z=_pad_to(data["z"], Epad),
                info=_pad_to(data["info"], Epad),           # zero info: no-op edges
                slot_local=tuple(_pad_to(x, Epad) for x in data["slot_local"]),
                slot_cslot=tuple(_pad_to(x, Epad) for x in data["slot_cslot"]),
                pp_seg=tuple(_pad_to(x, Epad) for x in data["pp_seg"]),
                pp_swap=tuple(_pad_to(x, Epad) for x in data["pp_swap"]),
                pl_seg=tuple(_pad_to(x, Epad) for x in data["pl_seg"]),
            )
            specs[name] = jax.tree.map(lambda _: P("edges"), new_data[name])
        self.edge_data = new_data
        self._edge_specs = specs

    # inside shard_map: identical single-chip kernels on the local slice,
    # then one psum over the mesh
    def _dist_sums(self, states, edge_data):
        pp, pl, ll, eta_p, eta_l, chi2, max_hdiag = self._edge_sums(
            states, edge_data)
        pp, pl, ll, eta_p, eta_l, chi2 = jax.lax.psum(
            (pp, pl, ll, eta_p, eta_l, chi2), "edges")
        max_hdiag = jax.lax.pmax(max_hdiag, "edges")
        return pp, pl, ll, eta_p, eta_l, chi2, max_hdiag

    def _dist_chi2(self, states, edge_data):
        return jax.lax.psum(self._chi2_impl(states, edge_data), "edges")

    def assemble(self, states) -> BlockSystem:
        sums = self._assemble_jit(states, self.edge_data)
        return self._finalize_jit(*sums)

    def chi2(self, states):
        return self._chi2_dist_jit(states, self.edge_data)
