"""Unit planning: map a gradient pytree onto a small list of flat
"compression units".

Motivation (TPU-first): the reference compresses every layer separately
(reference ps_quantizer.py:15-20 builds one compressor per parameter).  A
ResNet-50 has 161 leaves (76 above the passthrough threshold) — per-leaf
compression emits 76 small encode/decode subgraphs, which both bloats the
compiled HLO (minutes of XLA compile) and starves the MXU with small
matmuls.  Here leaves are packed into units:

  - all passthrough (<= threshold) leaves  -> ONE identity unit,
  - all compressed leaves whose size is divisible by ``c_dim`` -> ONE unit
    per compressor config (the subvector grid aligns with leaf boundaries,
    so per-subvector math is unchanged),
  - ragged leaves (size % c_dim != 0) -> individual units with the
    reference's dim fixup.

Grouping is semantics-preserving by construction: compressors with
per-layer budgets or whole-layer statistics (top-k / Maurey / TernGrad-style
c_dim==0 buckets) always stay per-leaf, and the VQ-family norm quantizer's
min/max ranges are segmented per original leaf inside the grouped unit
(``norm_segment_sizes``), bit-matching the reference's per-layer ranges.
``grouping='none'`` restores strict per-leaf units for everything (used by
the parity tests); for sign/qsgd/hsq the grouped math is proven equivalent
(tests/test_aggregate.py grouped-vs-leafwise tests).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from gqx.compress import IdenticalCompressor, make_compressor
from gqx.compress.api import Compressor

PyTree = Any


@dataclasses.dataclass(frozen=True)
class Unit:
    leaf_indices: Tuple[int, ...]   # indices into the flattened leaf list
    sizes: Tuple[int, ...]          # element count per member leaf
    compressor: Compressor          # over the concatenated flat vector
    pad: int = 0                    # zero tail appended by pack() so the
                                    # Pallas kernels' lane/tile alignment
                                    # needs no separate XLA pad copy (a
                                    # ResNet-50 unit's pad was a 752 MB
                                    # copy per encode, ~2.3 ms/step);
                                    # unpack() never reads the tail

    @property
    def size(self) -> int:
        return sum(self.sizes) + self.pad


def torch_axis_order(shape: Tuple[int, ...]) -> Tuple[int, ...]:
    """Permutation mapping a flax-layout parameter to the reference's torch
    memory layout, so the subvector/bucket partition of the flattened
    gradient matches the reference's ``vec.view(-1, dim)`` exactly
    (reference nearest_neighbor_compressor.py:65, qsgd_compressor.py:47):

      flax Dense kernel (in, out)        -> torch Linear.weight (out, in)
      flax Conv kernel (kh, kw, in, out) -> torch Conv2d.weight (out, in, kh, kw)

    This matters for quality, not just parity: a torch-order subvector of a
    dense/conv gradient spans consecutive *input* weights of ONE output unit
    (g[o, i:i+d] = delta[o] * x[i:i+d] for the last layer of the chain rule),
    which is far more correlated — hence more VQ-compressible — than a
    flax-order subvector spanning d different output units (measured: rel.
    reconstruction error 0.695 vs 0.729 on a real FCN layer-1 gradient).
    Leading stacked axes (nn.scan blocks) are preserved."""
    nd = len(shape)
    if nd >= 4:
        head = tuple(range(nd - 4))
        kh, kw, cin, cout = nd - 4, nd - 3, nd - 2, nd - 1
        return head + (cout, cin, kh, kw)
    if nd >= 2:
        head = tuple(range(nd - 2))
        return head + (nd - 1, nd - 2)
    return tuple(range(nd))


def outfirst_axis_order(shape: Tuple[int, ...]) -> Tuple[int, ...]:
    """Like :func:`torch_axis_order` but keeps the non-output axes in flax
    order: conv (kh, kw, cin, cout) -> (cout, kh, kw, cin).

    Identical to the torch layout for dense kernels and 1x1 convs (the bulk
    of a bottleneck ResNet); for KxK convs the subvector still spans
    consecutive weights of ONE output unit — the property the parity study
    showed matters for VQ quality — just ordered (kh, kw, cin) instead of
    (cin, kh, kw).  The payoff: the permutation is 2D-collapsible
    ({cout} | {rest} stays contiguous), which XLA lowers as a plain 2D
    transpose — measured 4.8 ms vs 44 ms for the full torch permutation on a
    ResNet-50 gradient x8 users (scripts/perf_probe.py)."""
    nd = len(shape)
    if nd >= 4:  # conv kernel (+ optional stacked lead axes)
        head = tuple(range(nd - 4))
        kh, kw, cin, cout = nd - 4, nd - 3, nd - 2, nd - 1
        return head + (cout, kh, kw, cin)
    if nd >= 2:  # dense kernel: same as the torch layout
        head = tuple(range(nd - 2))
        return head + (nd - 1, nd - 2)
    return tuple(range(nd))


def _invert_perm(perm: Tuple[int, ...]) -> Tuple[int, ...]:
    inv = [0] * len(perm)
    for i, p in enumerate(perm):
        inv[p] = i
    return tuple(inv)


def _rotation_split(perm: Tuple[int, ...]) -> Optional[int]:
    """If ``perm`` is a rotation — permuted order = orig[r:] + orig[:r] —
    return r, else None.  Every outfirst-layout perm is one (conv
    (kh,kw,cin,cout)->(cout,kh,kw,cin) is r=3, dense (in,out)->(out,in) is
    r=1), so its inverse can be expressed as a plain 2D transpose of the
    collapsed (prod(B), prod(A)) matrix.  Round-4 probe result: rewriting
    unpack that way LOST at full-step scale (update 3.8 -> 6.4 ms,
    PERF.md) — kept for documentation and future layout experiments."""
    n = len(perm)
    for r in range(1, n):
        if perm == tuple(range(r, n)) + tuple(range(r)):
            return r
    return None


class UnitPlan:
    """Pack/unpack between a pytree (with optional leading axes) and the
    per-unit flat vectors.

    With ``layout='torch'`` (default) every leaf is permuted to the
    reference's torch memory layout before flattening (``torch_axis_order``)
    so subvector/bucket partitions match the reference bit-for-bit;
    ``layout='natural'`` flattens flax-order directly."""

    def __init__(self, treedef, leaf_shapes: Sequence[Tuple[int, ...]], units: List[Unit],
                 layout: str = "torch", unit_dtypes: Optional[Sequence] = None):
        self.treedef = treedef
        self.leaf_shapes = list(leaf_shapes)
        self.units = units
        self.layout = layout
        # per-unit pack dtype (None = keep the leaves' dtype).  bfloat16 for
        # HSQ passes=1 units halves the pack-write + encode-read HBM traffic
        # and is the SAME rounding the kernel applies internally (PERF.md r4)
        self.unit_dtypes = (list(unit_dtypes) if unit_dtypes is not None
                            else [None] * len(units))
        if layout == "torch":
            self.perms = [torch_axis_order(s) for s in self.leaf_shapes]
        elif layout == "outfirst":
            self.perms = [outfirst_axis_order(s) for s in self.leaf_shapes]
        elif layout == "natural":
            self.perms = [tuple(range(len(s))) for s in self.leaf_shapes]
        else:
            raise ValueError(f"unknown quant_layout {layout!r}")
        covered = sorted(i for u in units for i in u.leaf_indices)
        assert covered == list(range(len(leaf_shapes))), "units must cover all leaves"

    # -- packing ------------------------------------------------------------
    def pack(self, tree: PyTree) -> List[jax.Array]:
        """tree leaves: (*lead, *leaf_shape) -> per-unit (*lead, unit_size)."""
        leaves = self.treedef.flatten_up_to(tree)
        out = []
        for u, dt in zip(self.units, self.unit_dtypes):
            flats = []
            for i, size in zip(u.leaf_indices, u.sizes):
                nlead = leaves[i].ndim - len(self.leaf_shapes[i])
                lead = leaves[i].shape[:nlead]
                x = leaves[i]
                if dt is not None:
                    x = x.astype(dt)  # cast BEFORE the transpose: halves it
                perm = self.perms[i]
                if perm != tuple(range(len(perm))):
                    x = jnp.transpose(
                        x, tuple(range(nlead)) + tuple(nlead + p for p in perm)
                    )
                flats.append(x.reshape(lead + (size,)))
            if u.pad:
                flats.append(jnp.zeros(lead + (u.pad,), flats[0].dtype))
            out.append(flats[0] if len(flats) == 1 else jnp.concatenate(flats, axis=-1))
        return out

    def unpack(self, unit_arrays: Sequence[jax.Array]) -> PyTree:
        """per-unit (*lead, unit_size) -> tree leaves (*lead, *leaf_shape)."""
        leaves: List[Any] = [None] * len(self.leaf_shapes)
        for u, arr in zip(self.units, unit_arrays):
            lead = arr.shape[:-1]
            nlead = len(lead)
            offset = 0
            for i, size in zip(u.leaf_indices, u.sizes):
                piece = jax.lax.slice_in_dim(arr, offset, offset + size, axis=arr.ndim - 1)
                perm = self.perms[i]
                shape = self.leaf_shapes[i]
                if perm != tuple(range(len(perm))):
                    # NOTE: expressing this inverse as a collapsed 2D
                    # transpose (every outfirst perm is a rotation, see
                    # _rotation_split) was probed in round 4 and LOST at
                    # full-step scale (update stage 3.8 -> 6.4 ms): XLA's
                    # grouped whole-unit reshapes feed the fused update
                    # better than per-leaf 2D transposes (PERF.md).
                    permuted_shape = tuple(shape[p] for p in perm)
                    piece = piece.reshape(lead + permuted_shape)
                    inv = _invert_perm(perm)
                    piece = jnp.transpose(
                        piece, tuple(range(nlead)) + tuple(nlead + p for p in inv)
                    )
                    leaves[i] = piece
                else:
                    leaves[i] = piece.reshape(lead + shape)
                offset += size
        return jax.tree.unflatten(self.treedef, leaves)

    @property
    def compressors(self) -> List[Compressor]:
        return [u.compressor for u in self.units]

    def wire_bytes(self) -> int:
        from gqx.ops.wire import wire_bytes

        return sum(wire_bytes(u.compressor) for u in self.units)


def plan_units(params: PyTree, config) -> UnitPlan:
    """Build the unit plan for a parameter/gradient pytree per config
    (quantizer, c_dim, grouping, passthrough_threshold)."""
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = ["/".join(str(getattr(k, "key", k)) for k in p) for p, _ in paths_leaves]
    leaves = [l for _, l in paths_leaves]
    shapes = [tuple(p.shape) for p in leaves]
    sizes = [int(p.size) for p in leaves]
    threshold = int(getattr(config, "passthrough_threshold", 1000))
    grouping = getattr(config, "grouping", "auto")
    name = config.quantizer

    # Leaves under an nn.scan carry a stacked leading axis (gqx.models.resnet
    # _RepeatedBlocks); the <=1000-element passthrough rule is per *block
    # slice* so decisions match the unscanned layout
    # (reference ps_quantizer.py:17-20 is per layer).  Scanned modules are
    # identified by the SCAN_AXIS_MARKER naming contract on an exact path
    # component (not a substring of the whole path).
    from gqx.models.common import SCAN_AXIS_MARKER

    def decision_size(i: int) -> int:
        has_scan_axis = any(
            seg.endswith(SCAN_AXIS_MARKER) for seg in paths[i].split("/")
        )
        if has_scan_axis and len(shapes[i]) > 1:
            return sizes[i] // shapes[i][0]
        return sizes[i]

    passthrough_idx = [i for i, s in enumerate(sizes) if decision_size(i) <= threshold]
    compressed_idx = [i for i, s in enumerate(sizes) if decision_size(i) > threshold]

    units: List[Unit] = []

    def leaf_unit(i, comp_name):
        comp = (
            IdenticalCompressor(sizes[i], (sizes[i],))
            if comp_name == "sgd"
            else make_compressor(comp_name, sizes[i], (sizes[i],), config)
        )
        units.append(Unit((i,), (sizes[i],), comp))

    group_ok = (
        grouping != "none"
        # whole-layer-bucket compressors must stay per-leaf: merging would
        # change the bucket scope (terngrad always, qsgd/hsq when c_dim==0).
        # top-k / Maurey budgets are per-layer in the reference
        # (topk_sparsification_compressor.py:15-16, maurey_sparsification.py:9)
        # — a grouped budget selects different coordinates, so they are
        # never grouped (equivalence test: tests/test_aggregate.py).
        and name not in ("sgd", "terngrad", "topk", "maurey")
        and not (name in ("qsgd", "hsq") and config.c_dim == 0)
    )

    if group_ok:
        # group compressed leaves divisible by c_dim (subvector compressors)
        # or all of them (sign/topk/maurey have no subvector grid)
        needs_alignment = name in ("qsgd", "hsq", "pvq", "residual")
        aligned = [
            i for i in compressed_idx
            if not needs_alignment or sizes[i] % config.c_dim == 0
        ]
        ragged = [i for i in compressed_idx if i not in aligned]
        if aligned:
            total = sum(sizes[i] for i in aligned)
            norm_segments = None
            pad = 0
            if name in ("hsq", "pvq", "residual"):
                # Per-leaf norm-range segments: the grouped unit's subvector
                # grid aligns with leaf boundaries (every member size is
                # divisible by c_dim), so the norm quantizer's min/max can be
                # computed per original leaf — exact parity with the
                # reference's one-compressor-per-layer ranges
                # (reference probabilistic_scalar_compressor.py:13-14).
                from gqx.compress.api import subvector_dim

                dim = subvector_dim(total, config.c_dim)
                assert all(sizes[i] % dim == 0 for i in aligned), dim
                # zero-pad the unit to the Pallas kernels' tile alignment at
                # pack time (rides the existing concat; a separate XLA pad
                # copies the whole 94 MB unit).  The pad is its OWN norm
                # segment so it never pollutes a real leaf's min/max range.
                if name == "hsq" and getattr(config, "use_pallas", False):
                    align = 65536  # 512 sublane rows x 128 lanes
                    if align % dim == 0:
                        pad = (-total) % align
                norm_segments = tuple(sizes[i] // dim for i in aligned)
                if pad:
                    norm_segments = norm_segments + (pad // dim,)
            comp = make_compressor(name, total + pad, (total + pad,), config,
                                   norm_segment_sizes=norm_segments)
            units.append(Unit(tuple(aligned), tuple(sizes[i] for i in aligned),
                              comp, pad=pad))
        for i in ragged:
            leaf_unit(i, name)
    else:
        for i in compressed_idx:
            leaf_unit(i, name)

    if passthrough_idx:
        total = sum(sizes[i] for i in passthrough_idx)
        units.append(
            Unit(tuple(passthrough_idx), tuple(sizes[i] for i in passthrough_idx),
                 IdenticalCompressor(total, (total,)))
        )

    # per-unit pack dtype: bf16 for HSQ units when the passes=1 kernel would
    # bf16-round the input anyway (identical rounding, half the HBM traffic);
    # identity/passthrough units always stay in the leaves' dtype (their
    # roundtrip feeds the fp32 optimizer update directly)
    ud = getattr(config, "unit_dtype", "auto")
    bf16_units = (
        ud == "bfloat16"
        or (
            ud == "auto"
            and name == "hsq"
            and int(getattr(config, "hsq_passes", 2)) == 1
            and not getattr(config, "ef", False)
            and getattr(config, "compute_dtype", "float32") == "bfloat16"
        )
    )
    unit_dtypes = [
        (jnp.bfloat16
         if bf16_units and not isinstance(u.compressor, IdenticalCompressor)
         else None)
        for u in units
    ]
    return UnitPlan(treedef, shapes, units,
                    layout=getattr(config, "quant_layout", "torch"),
                    unit_dtypes=unit_dtypes)


def plan_from_leaf_compressors(params: PyTree, compressors: PyTree,
                               layout: str = "torch") -> UnitPlan:
    """One unit per leaf with the given compressors (strict per-layer mode;
    also used by parity tests)."""
    leaves, treedef = jax.tree.flatten(params)
    comp_leaves = treedef.flatten_up_to(compressors)
    shapes = [tuple(p.shape) for p in leaves]
    units = [
        Unit((i,), (int(p.size),), c) for i, (p, c) in enumerate(zip(leaves, comp_leaves))
    ]
    return UnitPlan(treedef, shapes, units, layout=layout)
