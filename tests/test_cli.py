"""CLI <-> GQConfig default-parity guard.

Round-3 verdict found ``--hsq-passes`` defaulting to 2 in the CLI while
``GQConfig.hsq_passes`` defaulted to 1 (and ``--folded-users`` had the same
drift) — CLI users silently ran a different code path than config/bench
users.  This test pins the invariant: parsing an empty command line must
produce exactly ``GQConfig()``.
"""

import dataclasses

from gqx.cli import build_parser, config_from_args
from gqx.config import GQConfig


def test_cli_defaults_match_config_defaults():
    cfg = config_from_args(build_parser().parse_args([]))
    ref = GQConfig()
    mismatches = {
        f.name: (getattr(cfg, f.name), getattr(ref, f.name))
        for f in dataclasses.fields(GQConfig)
        if getattr(cfg, f.name) != getattr(ref, f.name)
    }
    assert not mismatches, f"CLI defaults diverge from GQConfig: {mismatches}"


def test_cli_flags_reach_config():
    # every mirrored flag actually lands in the config (spot-check the ones
    # with non-trivial conversion)
    args = build_parser().parse_args(
        ["--hsq-passes", "2", "--folded-users", "0", "--random", "0",
         "--use-pallas", "1", "--quantizer", "qsgd", "--c-dim", "128",
         "--n-bit", "2"]
    )
    cfg = config_from_args(args)
    assert cfg.hsq_passes == 2
    assert cfg.folded_users is False
    assert cfg.random is False
    assert cfg.use_pallas is True
    assert (cfg.quantizer, cfg.c_dim, cfg.n_bit) == ("qsgd", 128, 2)


def test_chain_ring_scale_warning():
    # chain ring on a big mesh is O(D) per-device work (32x slower than
    # segmented at 32 devices) — the runner must warn and point at
    # --ring-mode segmented (VERDICT r4 item 8)
    import warnings

    from gqx.parallel.collectives import warn_chain_ring_scale

    chain = GQConfig(mode="ring", ring_mode="chain")
    seg = GQConfig(mode="ring", ring_mode="segmented")

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert warn_chain_ring_scale(chain, n_devices=32)
        assert len(w) == 1 and "segmented" in str(w[0].message)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert not warn_chain_ring_scale(chain, n_devices=8)  # small: quiet
        assert not warn_chain_ring_scale(seg, n_devices=32)   # segmented: quiet
        assert not warn_chain_ring_scale(GQConfig(mode="ps"), n_devices=32)
        assert not w
