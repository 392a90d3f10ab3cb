"""Legacy proposal-classification head (SURVEY.md §2.13 — the
`RCNN`/`Classification_Model` role, reference detector.py:441-626):
shape contract, leading-dim flattening, and trainability."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from instance_nerf_tpu.models.legacy_classifier import ProposalClassifier


def test_forward_shapes_and_lead_dims():
    m = ProposalClassifier(num_classes=2)
    x = jnp.zeros((3, 7, 5, 5, 5, 16))  # (B, P, w, l, h, C)
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.shape == (3, 7, 2)
    # flat leading dim gives the same result per-roi
    flat = m.apply(params, x.reshape(21, 5, 5, 5, 16))
    np.testing.assert_allclose(np.asarray(out).reshape(21, 2),
                               np.asarray(flat), rtol=1e-6)


def test_learns_separable_objectness():
    """fg rois (bright pooled features) vs bg (dark) must separate in a
    few steps — the detector.py classification-path contract."""
    rng = np.random.default_rng(0)
    n = 64
    labels = rng.integers(0, 2, n)
    feats = rng.normal(0, 0.1, (n, 4, 4, 4, 8)) + labels[:, None, None, None, None]
    x = jnp.asarray(feats, jnp.float32)
    y = jnp.asarray(labels, jnp.int32)

    m = ProposalClassifier(num_classes=2, conv_channels=(16,), rep_size=32)
    params = m.init(jax.random.key(1), x)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            logits = m.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean(), logits

        (l, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l, logits

    for _ in range(40):
        params, opt, loss, logits = step(params, opt)
    acc = float((jnp.argmax(logits, -1) == y).mean())
    assert np.isfinite(float(loss))
    assert acc >= 0.9, acc
