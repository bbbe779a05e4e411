"""JAX ESM-2 vs torch transformers ``EsmModel`` — architecture golden.

The pretrained 650M weights are egress-blocked (ROADMAP retry log), but the
ARCHITECTURE is checkable offline: transformers ships the ESM code, so a
randomly-initialized ``EsmModel`` with the ESM-2 configuration (rotary
positions, token dropout, no absolute embeddings) is a bit-for-bit oracle
for everything except the weight values. These tests lock
``packppi_tpu.models.esm2`` (forward + HF-state-dict converter + alphabet
tokenizer) against that oracle, so converting the real checkpoint when the
download opens is purely mechanical (reference loads the torch model:
src/datamodules/components/helper.py:131-169).
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from packppi_tpu.models.esm2 import (  # noqa: E402
    CLS_ID, EOS_ID, MASK_ID, PAD_ID, ESM2Config, convert_hf_esm,
    esm2_forward, make_extractor, tokenize,
)

_EPS = 1e-5  # facebook/esm2_* configs use layer_norm_eps=1e-5


def _tiny_torch_esm(seed=0, layers=3, hidden=64, heads=4, inter=128):
    from transformers import EsmConfig
    from transformers.models.esm.modeling_esm import EsmModel

    torch.manual_seed(seed)
    cfg = EsmConfig(
        vocab_size=33, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=inter,
        max_position_embeddings=512, position_embedding_type="rotary",
        token_dropout=True, emb_layer_norm_before=False,
        pad_token_id=PAD_ID, mask_token_id=MASK_ID, layer_norm_eps=_EPS,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attn_implementation="eager",
    )
    model = EsmModel(cfg, add_pooling_layer=False).eval()
    jcfg = ESM2Config(hidden_size=hidden, num_layers=layers, num_heads=heads,
                      intermediate_size=inter, layer_norm_eps=_EPS)
    return model, jcfg


def _batch(seed=1, B=3, T=40):
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, 31, size=(B, T)).astype(np.int64)
    ids[:, 0] = CLS_ID
    # ragged lengths with eos + right padding
    lengths = [T, T - 7, T - 15]
    mask = np.zeros((B, T), np.int64)
    for b, n in enumerate(lengths):
        ids[b, n - 1] = EOS_ID
        ids[b, n:] = PAD_ID
        mask[b, :n] = 1
    # sprinkle mask tokens (exercises the token-dropout rescale, which
    # depends on the per-sequence observed mask ratio)
    ids[0, 5] = MASK_ID
    ids[1, [3, 9, 12]] = MASK_ID
    return ids, mask


def test_esm2_jax_matches_torch_esmmodel():
    """Batched padded JAX forward vs per-row UNPADDED torch forwards.

    The per-row oracle is deliberate: transformers 4.57's ``EsmModel``
    does not hand the attention mask to ``EsmEmbeddings`` (modeling_esm.py
    calls ``self.embeddings(input_ids=..., position_ids=...)`` only), so
    for PADDED batches its token-dropout rescale uses ``src_lengths = T``
    (padding included) and pad embeddings are not zeroed — deviating from
    fair-esm's ESM2 (mask-aware src_lengths + pad zeroing), which is what
    the reference loads via torch.hub. Our implementation follows
    fair-esm; running each torch row unpadded makes the two conventions
    coincide, and simultaneously locks our padding invariance (the padded
    batch must reproduce the unpadded per-row results)."""
    model, jcfg = _tiny_torch_esm()
    params = convert_hf_esm(model.state_dict(), jcfg)
    ids, mask = _batch()

    out = np.asarray(esm2_forward(params, ids.astype(np.int32),
                                  mask.astype(np.float32), jcfg))
    for b in range(ids.shape[0]):
        n = int(mask[b].sum())
        with torch.inference_mode():
            ref = model(input_ids=torch.tensor(ids[b:b + 1, :n]),
                        attention_mask=torch.ones((1, n), dtype=torch.long),
                        ).last_hidden_state[0].numpy()
        np.testing.assert_allclose(out[b, :n], ref, atol=2e-4, rtol=1e-4,
                                   err_msg=f"row {b}")


def test_esm2_jax_no_mask_tokens_all_valid():
    """No <mask>/<pad> anywhere: the token-dropout branch reduces to a
    constant scale; full-tensor equality."""
    model, jcfg = _tiny_torch_esm(seed=3)
    params = convert_hf_esm(model.state_dict(), jcfg)
    rng = np.random.default_rng(5)
    ids = rng.integers(4, 31, size=(2, 17)).astype(np.int64)
    ids[:, 0], ids[:, -1] = CLS_ID, EOS_ID
    mask = np.ones_like(ids)
    with torch.inference_mode():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    out = np.asarray(esm2_forward(params, ids.astype(np.int32),
                                  mask.astype(np.float32), jcfg))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_esm2_bf16_close_to_f32():
    model, jcfg = _tiny_torch_esm(seed=7)
    params = convert_hf_esm(model.state_dict(), jcfg)
    ids, mask = _batch(seed=9)
    f = np.asarray(esm2_forward(params, ids.astype(np.int32),
                                mask.astype(np.float32), jcfg))
    jb = ESM2Config(**{**jcfg.__dict__, "compute_dtype": "bfloat16"})
    b = np.asarray(esm2_forward(params, ids.astype(np.int32),
                                mask.astype(np.float32), jb))
    m = mask.astype(bool)
    scale = np.abs(f[m]).max()
    assert np.abs(b[m] - f[m]).max() < 0.05 * scale


def test_esm2_flash_attention_matches_dense():
    """attention_impl='flash' (ops/pallas_attention.py, interpret mode on
    CPU) must reproduce the dense-einsum path on a ragged padded batch —
    padding-mask semantics included. f32: both paths accumulate f32 and
    softmax f32, so agreement is at float rounding."""
    import dataclasses

    model, jcfg = _tiny_torch_esm(seed=11)
    params = convert_hf_esm(model.state_dict(), jcfg)
    ids, mask = _batch(seed=13)
    dense = np.asarray(esm2_forward(params, ids.astype(np.int32),
                                    mask.astype(np.float32), jcfg))
    flash = np.asarray(esm2_forward(
        params, ids.astype(np.int32), mask.astype(np.float32),
        dataclasses.replace(jcfg, attention_impl="flash")))
    m = mask.astype(bool)
    np.testing.assert_allclose(flash[m], dense[m], atol=2e-5, rtol=1e-5)


def test_esm2_auto_attention_matches_dense():
    """'auto' must be output-identical to dense everywhere it routes to
    dense (CPU backend always does), and must never crash on the length
    policy boundaries."""
    import dataclasses

    model, jcfg = _tiny_torch_esm(seed=19)
    params = convert_hf_esm(model.state_dict(), jcfg)
    ids, mask = _batch(seed=21)
    dense = np.asarray(esm2_forward(params, ids.astype(np.int32),
                                    mask.astype(np.float32), jcfg))
    auto = np.asarray(esm2_forward(
        params, ids.astype(np.int32), mask.astype(np.float32),
        dataclasses.replace(jcfg, attention_impl="auto")))
    np.testing.assert_array_equal(auto, dense)


def test_flash_mha_kernel_vs_reference_softmax():
    """Kernel-level oracle: flash_mha == softmax(qk^T + bias) v computed
    by hand, across a ragged tail (T % blk_q != 0) and blk_q > T."""
    import jax.numpy as jnp

    from packppi_tpu.ops.pallas_attention import flash_mha

    rng = np.random.default_rng(17)
    for B, H, T, D, blk_q in ((2, 3, 48, 16, 32), (1, 2, 24, 8, 256)):
        q = rng.standard_normal((B, H, T, D)).astype(np.float32)
        k = rng.standard_normal((B, H, T, D)).astype(np.float32)
        v = rng.standard_normal((B, H, T, D)).astype(np.float32)
        bias = np.zeros((B, T), np.float32)
        bias[:, T - 5:] = -1e9  # padded keys
        logits = np.einsum("bhqd,bhkd->bhqk", q, k) + bias[:, None, None, :]
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        ref = np.einsum("bhqk,bhkd->bhqd", w, v)
        out = np.asarray(flash_mha(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(bias),
                                   blk_q=blk_q, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_tokenize_matches_hf_contract():
    """The in-repo alphabet tokenizer reproduces the chain-separated
    format's token stream: one id per residue char / per <...> special,
    cls prepended, eos appended — the contract tests/test_esm.py locks
    with a fake HF tokenizer."""
    seq = "MKV" + "<pad>" * 3 + "A<mask>C"
    ids = tokenize(seq)
    assert ids[0] == CLS_ID and ids[-1] == EOS_ID
    assert list(ids[1:-1]) == [20, 15, 7, PAD_ID, PAD_ID, PAD_ID, 5, MASK_ID, 23]
    # unknown char -> unk, matching AutoTokenizer
    assert tokenize("J", add_special_tokens=False)[0] == 3


def test_make_extractor_pads_and_strips():
    model, jcfg = _tiny_torch_esm(seed=11)
    params = convert_hf_esm(model.state_dict(), jcfg)
    extract = make_extractor(params, jcfg)
    ids = tokenize("MKVLA" + "<pad>" * 2 + "WCY")
    out = extract(ids)
    assert out.shape == (len(ids), jcfg.hidden_size)
    with torch.inference_mode():
        ref = model(input_ids=torch.tensor(ids[None].astype(np.int64)),
                    attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
                    ).last_hidden_state[0].numpy()
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_get_esm_extractor_jax_backend_end_to_end(monkeypatch):
    """The full extractor pipeline (chain-separated sequence -> in-repo
    tokenizer -> JAX forward -> cls/eos strip -> residue realignment) with
    ``from_pretrained`` stubbed to the tiny random model; the jax and torch
    backends must agree per residue."""
    import transformers

    import packppi_tpu.data.esm as esm_mod

    model, _ = _tiny_torch_esm(seed=13, hidden=64)
    monkeypatch.setattr(
        transformers.EsmModel, "from_pretrained",
        classmethod(lambda cls, *a, **k: model))
    esm_mod._extractor_cache.clear()

    restypes = np.array([20, 15, 7, 5, 23, 22, 19, 20, 15], np.int32) % 20
    chains = np.array([0, 0, 0, 0, 1, 1, 1, 1, 1], np.int32)
    mask_pos = np.zeros(9, bool)
    mask_pos[2] = True

    ex_jax = esm_mod.get_esm_extractor(backend="jax")
    ex_torch = esm_mod.get_esm_extractor(backend="torch")
    assert ex_jax is not None and ex_torch is not None
    a = ex_jax(restypes, chains, mask_pos)
    b = ex_torch(restypes, chains, mask_pos)
    assert a.shape == (9, 64)
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-4)
    esm_mod._extractor_cache.clear()


def test_esm2_tensor_parallel_matches_single_device():
    """esm2_forward jitted over a (data=2, model=4) mesh with the
    tensor-parallel param shardings must reproduce the single-device
    result (GSPMD inserts the collectives; values identical up to f32
    reduction order)."""
    import jax

    from packppi_tpu.models.esm2 import esm2_param_shardings
    from packppi_tpu.parallel import batch_sharding, make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")

    model, jcfg = _tiny_torch_esm(seed=17)
    params = convert_hf_esm(model.state_dict(), jcfg)
    ids, mask = _batch(seed=19, B=4, T=32)
    ids_j, mask_j = ids.astype(np.int32), mask.astype(np.float32)

    ref = np.asarray(esm2_forward(params, ids_j, mask_j, jcfg))

    mesh = make_mesh(8, model_parallel=4)
    p_shard = jax.device_put(params, esm2_param_shardings(mesh, params))
    bs = batch_sharding(mesh)
    fwd = jax.jit(lambda p, i, m: esm2_forward(p, i, m, jcfg),
                  in_shardings=(esm2_param_shardings(mesh, params), bs, bs))
    out = np.asarray(fwd(p_shard, jax.device_put(ids_j, bs),
                         jax.device_put(mask_j, bs)))
    valid = mask.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=2e-5, rtol=1e-5)
