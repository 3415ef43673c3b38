"""Pipeline-parallelism (parallel/pp.py) tests on the virtual 8-device
CPU mesh: the GPipe schedule over the depth-sharded scale stack must be
numerically identical to the single-device lax.scan stack — forward AND
backward (grads flow through the scan/ppermute transposes).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from duoformer_tcga_tpu.models import transformer as tf
from duoformer_tcga_tpu.parallel import pp as pp_lib

DIM, HEADS, DEPTH = 64, 4, 4


def _need(n):
    if len(jax.devices("cpu")) < n:
        pytest.skip(f"needs {n} virtual CPU devices")


def _stack(key):
    return tf.stack_init(tf.scale_block_init, key, DEPTH, DIM, HEADS)


_apply = functools.partial(tf.scale_block_apply, num_heads=HEADS)


def _ref(stacked, x):
    return tf._scan_blocks(_apply, stacked, x, None, False, DEPTH)


def _inputs(b=16):
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    return _stack(k1), jax.random.normal(k2, (b, 2, 6, DIM), jnp.float32)


def test_pipeline_full_depth_split():
    """pipe=8 with a depth-8 stack: one block per stage, no data axis."""
    _need(8)
    mesh = pp_lib.make_pp_mesh(8, pipeline_parallel=8,
                               devices=jax.devices("cpu"))
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    stacked = tf.stack_init(tf.scale_block_init, k1, 8, DIM, HEADS)
    x = jax.random.normal(k2, (4, 2, 6, DIM), jnp.float32)
    want = tf._scan_blocks(_apply, stacked, x, None, False, 8)
    got = pp_lib.pipeline_stack_apply(mesh, stacked, x, _apply,
                                      microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("pipe,micro", [(2, 1), (2, 2), (2, 4),
                                        (4, 2), (4, 4)])
def test_pipeline_forward_matches_scan(pipe, micro):
    _need(8)
    mesh = pp_lib.make_pp_mesh(8, pipeline_parallel=pipe,
                               devices=jax.devices("cpu"))
    stacked, x = _inputs()
    want = _ref(stacked, x)
    got = pp_lib.pipeline_stack_apply(mesh, stacked, x, _apply,
                                      microbatches=micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


def test_pipeline_forward_under_jit():
    _need(8)
    mesh = pp_lib.make_pp_mesh(8, pipeline_parallel=4,
                               devices=jax.devices("cpu"))
    stacked, x = _inputs()

    @jax.jit
    def run(stacked, x):
        return pp_lib.pipeline_stack_apply(mesh, stacked, x, _apply,
                                           microbatches=2)

    np.testing.assert_allclose(np.asarray(run(stacked, x)),
                               np.asarray(_ref(stacked, x)),
                               rtol=0, atol=1e-6)


def test_pipeline_grads_match_scan():
    _need(8)
    mesh = pp_lib.make_pp_mesh(8, pipeline_parallel=4,
                               devices=jax.devices("cpu"))
    stacked, x = _inputs()
    g = jax.random.normal(jax.random.PRNGKey(3), x.shape, jnp.float32)

    def loss_pp(stacked, x):
        out = pp_lib.pipeline_stack_apply(mesh, stacked, x, _apply,
                                          microbatches=2)
        return jnp.sum(out * g)

    def loss_ref(stacked, x):
        return jnp.sum(_ref(stacked, x) * g)

    (gp_s, gp_x) = jax.grad(loss_pp, argnums=(0, 1))(stacked, x)
    (gr_s, gr_x) = jax.grad(loss_ref, argnums=(0, 1))(stacked, x)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gr_x),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gp_s), jax.tree.leaves(gr_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_pipeline_remat_grads_match():
    _need(8)
    mesh = pp_lib.make_pp_mesh(8, pipeline_parallel=2,
                               devices=jax.devices("cpu"))
    stacked, x = _inputs()

    def loss(stacked, remat):
        out = pp_lib.pipeline_stack_apply(mesh, stacked, x, _apply,
                                          microbatches=2, remat=remat)
        return jnp.sum(out ** 2)

    g_plain = jax.grad(lambda s: loss(s, False))(stacked)
    g_remat = jax.grad(lambda s: loss(s, True))(stacked)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        # recompute-vs-saved reorders float reductions: ~1e-6 relative
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)


def test_pipeline_dropout_runs_and_is_finite():
    _need(8)
    mesh = pp_lib.make_pp_mesh(8, pipeline_parallel=2,
                               devices=jax.devices("cpu"))
    stacked, x = _inputs()
    apply_drop = functools.partial(tf.scale_block_apply, num_heads=HEADS,
                                   proj_drop=0.3, train=True)
    out = pp_lib.pipeline_stack_apply(
        mesh, stacked, x, apply_drop, microbatches=2,
        rng=jax.random.PRNGKey(5), train=True)
    assert np.isfinite(np.asarray(out)).all()
    # dropout active: the output must differ from the eval path
    assert not np.allclose(np.asarray(out), np.asarray(_ref(stacked, x)))


def test_pipeline_divisibility_errors():
    _need(8)
    mesh = pp_lib.make_pp_mesh(8, pipeline_parallel=4,
                               devices=jax.devices("cpu"))
    stacked, x = _inputs()
    bad_depth = jax.tree.map(lambda a: a[:3], stacked)   # 3 % 4 != 0
    with pytest.raises(ValueError, match="depth"):
        pp_lib.pipeline_stack_apply(mesh, bad_depth, x, _apply)
    with pytest.raises(ValueError, match="batch"):
        pp_lib.pipeline_stack_apply(mesh, stacked, x[:6], _apply,
                                    microbatches=2)  # 6 % (2*2) != 0
    with pytest.raises(ValueError, match="not divisible by"):
        pp_lib.make_pp_mesh(8, pipeline_parallel=3,
                            devices=jax.devices("cpu"))


def test_pipeline_degenerate_single_stage():
    _need(8)
    mesh = pp_lib.make_pp_mesh(8, pipeline_parallel=1,
                               devices=jax.devices("cpu"))
    stacked, x = _inputs()
    got = pp_lib.pipeline_stack_apply(mesh, stacked, x, _apply)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(stacked, x)),
                               rtol=0, atol=0)


def _tiny_former():
    return tf.MultiscaleFormer(depth=DEPTH, scales=2, num_heads=HEADS,
                               embed_dim=DIM, num_classes=3, num_patches=4)


def test_multiscaleformer_pipeline_context_parity():
    _need(8)
    mesh = pp_lib.make_pp_mesh(8, pipeline_parallel=4,
                               devices=jax.devices("cpu"))
    model = _tiny_former()
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 6, DIM), jnp.float32)
    want = model.apply(params, x)
    with pp_lib.pipeline_context(mesh, microbatches=2):
        got = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)


def test_multiscaleformer_pipeline_train_grads():
    """Full-model backward through the pipeline: CE grads on every param
    leaf (scale stack sharded, patch stack replicated) match the plain
    path."""
    _need(8)
    mesh = pp_lib.make_pp_mesh(8, pipeline_parallel=2,
                               devices=jax.devices("cpu"))
    model = _tiny_former()
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 6, DIM), jnp.float32)
    labels = jnp.array([0, 1, 2, 0, 1, 2, 0, 1], jnp.int32)

    def loss(params, pipelined):
        if pipelined:
            with pp_lib.pipeline_context(mesh, microbatches=2):
                logits = model.apply(params, x)
        else:
            logits = model.apply(params, x)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

    g_pp = jax.grad(lambda p: loss(p, True))(params)
    g_ref = jax.grad(lambda p: loss(p, False))(params)
    flat_pp = jax.tree_util.tree_leaves_with_path(g_pp)
    flat_ref = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_ref))
    for path, leaf in flat_pp:
        ref = flat_ref[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_pp_train_step_exact_vs_single_device():
    """One full train step (backbone -> tokens -> pipelined scale stack ->
    patch stack -> CE -> Adam) on a ("data", "pipe") mesh: loss and
    updated params match the single-device step."""
    _need(8)
    import duoformer_tcga_tpu as dft
    from duoformer_tcga_tpu import train as train_lib
    from duoformer_tcga_tpu.parallel import mesh as mesh_lib

    model = dft.build_model_no_extra_params(
        num_classes=2, num_layers=2, embed_dim=96, proj_dim=96,
        num_heads=12, depth=2)
    sched = train_lib.onecycle_schedule(1e-3, total_steps=10)
    opt = train_lib.make_optimizer(
        sched, weight_decay=1e-4,
        frozen_label_fn=train_lib.backbone_frozen_labels)
    state = train_lib.init_train_state(model, jax.random.PRNGKey(0), opt)
    batch_host = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 3)),
        "label": jnp.array([0, 1] * 4, jnp.int32),
    }
    rng = jax.random.PRNGKey(2)

    ref_step = train_lib.make_train_step(model, opt, donate=False)
    ref_state, ref_metrics = ref_step(state, batch_host, rng)

    mesh = pp_lib.make_pp_mesh(8, pipeline_parallel=2,
                               devices=jax.devices("cpu"))   # dp=4 x pp=2
    pp_state = {
        "params": pp_lib.shard_params_pp(mesh, state["params"]),
        "opt_state": mesh_lib.replicate(mesh, state["opt_state"]),
        "step": mesh_lib.replicate(mesh, state["step"]),
    }
    batch = mesh_lib.shard_batch(mesh, batch_host)
    step = train_lib.make_train_step(model, opt, mesh=mesh, donate=False,
                                     pp_microbatches=2)
    pp_state2, pp_metrics = step(pp_state, batch,
                                 mesh_lib.replicate(mesh, rng))
    np.testing.assert_allclose(float(pp_metrics["loss"]),
                               float(ref_metrics["loss"]), atol=1e-5)
    h_ref = np.asarray(ref_state["params"]["transformer"]["head"]["w"])
    h_pp = np.asarray(pp_state2["params"]["transformer"]["head"]["w"])
    np.testing.assert_allclose(h_pp, h_ref, atol=1e-5)
    # a pipelined (depth-sharded) scale-block leaf also moved identically
    q_ref = np.asarray(
        ref_state["params"]["transformer"]["scale_blocks"]["attn"]["qkv"]["w"])
    q_pp = np.asarray(
        pp_state2["params"]["transformer"]["scale_blocks"]["attn"]["qkv"]["w"])
    np.testing.assert_allclose(q_pp, q_ref, atol=1e-5)


def test_pp_tp_mesh_rejected():
    from duoformer_tcga_tpu import train as train_lib
    from jax.sharding import Mesh
    devs = np.asarray(jax.devices("cpu")[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "model", "pipe"))
    with pytest.raises(ValueError, match="TP or PP"):
        train_lib.make_train_step(object(), object(), mesh=mesh)


def test_shard_params_pp_placement():
    _need(8)
    mesh = pp_lib.make_pp_mesh(8, pipeline_parallel=4,
                               devices=jax.devices("cpu"))
    model = _tiny_former()
    params = model.init(jax.random.PRNGKey(0))
    placed = pp_lib.shard_params_pp(mesh, params)
    stack_leaf = placed["scale_blocks"]["attn"]["qkv"]["w"]
    spec = stack_leaf.sharding.spec
    assert spec[0] == pp_lib.PIPE_AXIS
    head_leaf = placed["head"]["w"]
    assert all(s is None for s in head_leaf.sharding.spec)
    # depth 4 shards over pipe=4; a non-divisible stack must raise
    bad = {"scale_blocks": {"w": jnp.zeros((3, DIM))}}
    with pytest.raises(ValueError, match="not divisible"):
        pp_lib.shard_params_pp(mesh, bad)
