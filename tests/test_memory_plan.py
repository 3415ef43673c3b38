"""Automatic train-memory/speed policy (VERDICT r2 missing #3): the
planner that picks save-hidden / gradient-accumulation / remat from
variant token count, per-device batch, and HBM — calibrated against the
measured v5e facts in docs/performance.md (2-scale B<=320 fits
save-hidden, B=384 OOMs; 3-scale B=128 needs 2 microbatches for memory;
the reference's own configs must train with zero flags). Round 3 added
the SPEED rule: deeper accumulation at fixed effective batch measured
455 -> 428 ms/step, optimal at ~9408 token rows per microbatch, so the
planner targets the largest divisor that keeps the microbatch at or
above that floor (and >= 8 images)."""

import jax.numpy as jnp

import duoformer_tcga_tpu as dft
from duoformer_tcga_tpu import train as train_lib

HBM = 16 * 1024**3  # v5e


def _plan(num_layers, batch, **kw):
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=num_layers, embed_dim=768, proj_dim=768,
        num_heads=12, depth=12, dtype=jnp.bfloat16)
    return train_lib.plan_train_memory(model, batch, hbm_bytes=HBM, **kw)


def test_flagship_2scale_b256_speed_accum():
    """B=256 2-scale: memory fits at accum 1, but microbatch 32 (x8) is
    the measured throughput optimum (428 vs 455 ms/step)."""
    p = _plan(2, 256)
    assert p == {**p, "accum_steps": 8, "save_hidden": True, "remat": False}
    assert "9408" in p["reason"]


def test_2scale_b384_microbatches():
    """B=384 OOMed HBM with save-hidden in round 2 (manual fix was
    SAVE_HIDDEN=0); the planner microbatches — to the same optimal
    32-image microbatch the speed rule picks."""
    p = _plan(2, 384)
    assert p["accum_steps"] == 12 and p["save_hidden"]


def test_3scale_b128_microbatches():
    """The reference's 3-scale regime at B=128: round 2 required the user
    to pass accum manually; memory needs x2, the speed floor allows
    microbatch 16 (17248 rows)."""
    p = _plan(3, 128)
    assert p["accum_steps"] == 8 and p["save_hidden"] and not p["remat"]


def test_4scale_b16_reference_setting():
    """main_toy.py:65's own 4-layer batch: must need no flags at all.
    The 8-image floor stops the speed rule at microbatch 8."""
    p = _plan(4, 16)
    assert p == {**p, "accum_steps": 2, "save_hidden": True, "remat": False}


def test_small_batch_no_accum():
    """Below 16 images there is no divisor with microbatch >= 8 except
    trivial splits; B=8 must stay accum 1."""
    p = _plan(2, 8)
    assert p["accum_steps"] == 1 and p["save_hidden"]


def test_unfrozen_bn_disables_accum():
    """bn_stats training cannot microbatch -> falls back to the
    recompute-from-x backward."""
    p = _plan(3, 128, allow_accum=False)
    assert p["accum_steps"] == 1 and not p["save_hidden"]
    assert not p["remat"]


def test_remat_last_resort():
    p = _plan(4, 128, allow_accum=False)
    assert p["remat"] and not p["save_hidden"]


def test_data_parallel_divides_batch():
    """8-way DP at global B=1024 = per-device B=128: same plan as B=128
    single-chip."""
    p = _plan(3, 1024, data_parallel=8)
    assert p["accum_steps"] == 8 and p["save_hidden"]


def test_unfrozen_backbone_b192_fits_save_hidden():
    """Measured v5e fact (probes/_probe_r3_unfrozen2.py): unfrozen
    2-scale save-hidden FITS at B=192 (457.3 tiles/s) — the +18MB/image
    backbone term must not push B<=192 off the fast path."""
    for b in (32, 64, 128, 192):
        p = _plan(2, b, allow_accum=False, unfrozen_backbone=True)
        assert p == {**p, "accum_steps": 1, "save_hidden": True,
                     "remat": False}, (b, p)


def test_unfrozen_backbone_b256_remats():
    """Measured v5e fact: unfrozen 2-scale B=256 save-hidden fails to
    compile (HBM), and remat (417.9 tiles/s) beats recompute-from-x
    (393.6) — the planner must go straight to remat, skipping the nosh
    rung it uses for frozen configs."""
    p = _plan(2, 256, allow_accum=False, unfrozen_backbone=True)
    assert p["remat"] and p["accum_steps"] == 1
    assert "unfrozen" in p["reason"]


def test_unfrozen_r18_lighter_backbone():
    """r18's activation footprint is ~8MB/image — B=256 2-scale stays on
    monolithic save-hidden where r50 must remat."""
    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=768, proj_dim=768,
        num_heads=12, depth=12, dtype=jnp.bfloat16, backbone="r18")
    p = train_lib.plan_train_memory(model, 256, hbm_bytes=HBM,
                                    allow_accum=False,
                                    unfrozen_backbone=True)
    assert p["save_hidden"] and not p["remat"]
