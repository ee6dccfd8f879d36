"""Vectorized relation fuser vs an independent numpy loop implementing the
reference semantics (GLIGEN/ldm/modules/attention.py:315-359)."""
import numpy as np
import jax
import jax.numpy as jnp

from layoutllm_t2i_tpu.models import blocks


def _np_layer_norm(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * np.asarray(p["weight"]) + np.asarray(p["bias"])


def _np_mha(q, k, v, heads):
    B, N, HC = q.shape
    M = k.shape[1]
    C = HC // heads
    qh = q.reshape(B, N, heads, C).transpose(0, 2, 1, 3)
    kh = k.reshape(B, M, heads, C).transpose(0, 2, 1, 3)
    vh = v.reshape(B, M, heads, C).transpose(0, 2, 1, 3)
    sim = np.einsum("bhnc,bhmc->bhnm", qh, kh) * C ** -0.5
    e = np.exp(sim - sim.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    out = np.einsum("bhnm,bhmc->bhnc", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, N, HC)


def _np_cross_attn(p, x, kv, heads):
    q = x @ np.asarray(p["to_q"]["weight"])
    k = kv @ np.asarray(p["to_k"]["weight"])
    v = kv @ np.asarray(p["to_v"]["weight"])
    out = _np_mha(q, k, v, heads)
    return out @ np.asarray(p["to_out"]["0"]["weight"]) + np.asarray(p["to_out"]["0"]["bias"])


def _np_geglu_ff(p, x):
    from scipy.special import erf
    h = x @ np.asarray(p["net"]["0"]["proj"]["weight"]) + np.asarray(p["net"]["0"]["proj"]["bias"])
    a, gate = np.split(h, 2, axis=-1)
    gelu = gate * 0.5 * (1 + erf(gate / np.sqrt(2)))
    h = a * gelu
    return h @ np.asarray(p["net"]["2"]["weight"]) + np.asarray(p["net"]["2"]["bias"])


def _loop_reference(p, x, relations, boxes, masks, h, w, heads):
    """Direct per-object loop following the reference's control flow."""
    b, hw, c = x.shape
    mo = boxes.shape[1]
    hidden = _np_layer_norm(p["norm3"], x).reshape(b, h, w, c)
    nbox = masks.sum(-1)
    obj_mask = np.zeros((b, mo, h, w, 1))
    obj_features = np.zeros((b, mo, c), dtype=np.float32)
    x0 = (boxes[:, :, 0] * w).astype(int)
    y0 = (boxes[:, :, 1] * h).astype(int)
    x1 = np.minimum(boxes[:, :, 2] * w, w).astype(int)
    y1 = np.minimum(boxes[:, :, 3] * h, h).astype(int)
    for k in range(b):
        for i in range(mo):
            left, right, top, bottom = x0[k, i], x1[k, i], y0[k, i], y1[k, i]
            if i < nbox[k] and left != right and top != bottom:
                obj_mask[k, i, top:bottom, left:right] = 1
                obj_features[k, i] = hidden[k, top:bottom, left:right].reshape(-1, c).mean(0)
            else:
                break
    attn = _np_cross_attn(p["attn"], _np_layer_norm(p["norm1"], obj_features),
                          relations, heads)
    obj_features = obj_features + np.tanh(np.asarray(p["alpha_attn"])) * attn
    obj_features = obj_features + np.tanh(np.asarray(p["alpha_dense"])) * _np_geglu_ff(
        p["ff"], _np_layer_norm(p["norm2"], obj_features))
    rep = np.broadcast_to(hidden[:, None], (b, mo, h, w, c)).copy()
    rep = rep + obj_mask * obj_features[:, :, None, None, :]
    out = rep.mean(axis=1)
    return out.reshape(b, hw, c)


def test_relation_fuser_matches_loop_reference(rng):
    b, h, w, c, mo, r, heads = 2, 8, 8, 32, 6, 5, 4
    p = blocks.init_relation_cross_attention(jax.random.PRNGKey(0), c, 16, 16, heads, c // heads)
    # give the gates nonzero values so the attn/ff paths are exercised
    p["alpha_attn"] = jnp.asarray(0.7)
    p["alpha_dense"] = jnp.asarray(-0.3)

    x = rng.standard_normal((b, h * w, c), dtype=np.float32)
    relations = rng.standard_normal((b, r, 16), dtype=np.float32)
    boxes = np.zeros((b, mo, 4), dtype=np.float32)
    masks = np.zeros((b, mo), dtype=np.float32)
    # sample 1: 3 valid boxes, then a degenerate one, then a valid one that the
    # reference's `break` skips
    boxes[0, :5] = [
        [0.0, 0.0, 0.5, 0.5],
        [0.25, 0.25, 1.0, 1.0],
        [0.6, 0.1, 0.9, 0.2],
        [0.4, 0.4, 0.45, 0.45],  # degenerate after int() at 8x8
        [0.1, 0.1, 0.9, 0.9],    # skipped by break
    ]
    masks[0, :5] = 1
    # sample 2: no boxes at all
    ours = np.asarray(
        blocks.relation_cross_attention(
            p, jnp.asarray(x), jnp.asarray(relations), jnp.asarray(boxes),
            jnp.asarray(masks), h, w, heads)
    )
    ref = _loop_reference(jax.tree.map(np.asarray, p), x, relations, boxes, masks,
                          h, w, heads)
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_rasterize_breaks_at_degenerate():
    boxes = jnp.asarray([[[0.0, 0.0, 0.5, 0.5], [0.2, 0.2, 0.2, 0.8], [0.0, 0.0, 1.0, 1.0]]])
    masks = jnp.asarray([[1.0, 1.0, 1.0]])
    region, processed = blocks.rasterize_boxes(boxes, masks, 8, 8)
    assert np.asarray(processed).tolist() == [[True, False, False]]
    assert np.asarray(region)[0, 0].sum() == 16  # 4x4 block
    assert np.asarray(region)[0, 1:].sum() == 0
