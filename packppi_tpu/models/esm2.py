"""ESM-2 protein language model, TPU-native (jit + lax.scan over layers).

The reference extracts per-residue ESM-2 650M embeddings with a torch
model on GPU (reference: src/datamodules/components/helper.py:131-169,
loaded via torch.hub). Here the transformer itself is reimplemented in
JAX so embedding extraction runs on TPU, batched and jit-compiled:

* layer parameters are STACKED along a leading [num_layers, ...] axis and
  the encoder is one ``lax.scan`` over them — compile time is O(1) in
  depth (33 layers for 650M), and XLA pipelines the per-layer weight
  fetches from HBM behind the matmuls;
* softmax and LayerNorm run in f32; matmuls may run in bf16 via
  ``compute_dtype`` (the MXU path — embeddings are consumed by a
  downstream head, parity within bf16 tolerance);
* rotary position embeddings are computed on the fly from a static
  [T, head_dim] cos/sin table folded into the jit.

Semantics match HuggingFace ``EsmModel`` (facebook/esm2_*) exactly in f32
— ESM-2 specifics: query-side 1/sqrt(d_h) scaling BEFORE rotary, erf-gelu
(not tanh), token-dropout rescale of mask tokens at the embedding, no
absolute position embeddings, pre-LN blocks with a final post-encoder
LayerNorm. Locked against a randomly-initialized torch ``EsmModel`` in
``tests/test_esm2_jax.py`` (the architecture golden is torch-checked
offline; only the pretrained 650M weight download is egress-gated —
``convert_hf_esm`` consumes its state dict unchanged when present).

The fixed 33-token ESM alphabet ships here too (``tokenize``), so
extraction does not depend on the HF tokenizer download.
"""
from __future__ import annotations

import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np

# The fair-esm / HF ESM-2 alphabet (fixed across all ESM-2 checkpoints):
# ids 0-3 are specials, 4-30 residue/extra symbols, 31 <null_1>, 32 <mask>.
ESM_TOKENS = (
    "<cls>", "<pad>", "<eos>", "<unk>",
    "L", "A", "G", "V", "S", "E", "R", "T", "I", "D", "P", "K", "Q", "N",
    "F", "Y", "M", "H", "W", "C", "X", "B", "U", "Z", "O", ".", "-",
    "<null_1>", "<mask>",
)
TOKEN_TO_ID = {t: i for i, t in enumerate(ESM_TOKENS)}
CLS_ID, PAD_ID, EOS_ID, UNK_ID, MASK_ID = 0, 1, 2, 3, 32

_SPECIAL_RE = re.compile(r"<[^>]+>|.")


def tokenize(seq: str, add_special_tokens: bool = True) -> np.ndarray:
    """Token ids for a sequence string that may embed ``<pad>``/``<mask>``
    specials (the chain-separated format of data/esm.py). One id per
    residue char or per ``<...>`` special; unknown chars map to <unk> —
    the HF tokenizer contract (tests/test_esm.py's fake tokenizer)."""
    ids = [TOKEN_TO_ID.get(tok, UNK_ID) for tok in _SPECIAL_RE.findall(seq)]
    if add_special_tokens:
        ids = [CLS_ID] + ids + [EOS_ID]
    return np.asarray(ids, dtype=np.int32)


@dataclasses.dataclass(frozen=True)
class ESM2Config:
    vocab_size: int = 33
    hidden_size: int = 1280          # 650M
    num_layers: int = 33
    num_heads: int = 20
    intermediate_size: int = 5120
    layer_norm_eps: float = 1e-5     # HF esm2 config value
    token_dropout: bool = True
    mask_token_id: int = MASK_ID
    pad_token_id: int = PAD_ID
    compute_dtype: str = "float32"   # "bfloat16": matmuls on the MXU in bf16
    # "flash": Pallas attention (ops/pallas_attention.py) — the [B,H,T,T]
    # plane stays in VMEM instead of streaming through HBM. Forward-only
    # (extraction is frozen-eval, like the reference's torch.hub usage).
    # "auto": flash on TPU for long sequences only — measured in-model
    # crossover on v5e 650M bf16: T=2048 +25%, T=1024 +1%, T=512 -19%
    # (PERF.md "ESM-2 embedding extraction"); dense elsewhere.
    attention_impl: str = "dense"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _stack(mats):
    return jnp.stack([jnp.asarray(m, jnp.float32) for m in mats])


def convert_hf_esm(state_dict, cfg: ESM2Config) -> dict:
    """HF ``EsmModel.state_dict()`` -> stacked-layer param pytree.

    Works on any ESM-2-family checkpoint (rotary, no absolute positions);
    tensors may be torch (detached via ``.cpu().numpy()``) or numpy.
    Linear kernels are transposed to [in, out] (JAX convention)."""
    def get(name):
        t = state_dict[name]
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    L = cfg.num_layers
    p = {"embedding": jnp.asarray(get("embeddings.word_embeddings.weight"), jnp.float32),
         "final_ln_scale": jnp.asarray(get("encoder.emb_layer_norm_after.weight"), jnp.float32),
         "final_ln_bias": jnp.asarray(get("encoder.emb_layer_norm_after.bias"), jnp.float32)}

    def lin(i, stem):
        w = get(f"encoder.layer.{i}.{stem}.weight").T  # [in, out]
        b = get(f"encoder.layer.{i}.{stem}.bias")
        return w, b

    layers = {k: [] for k in
              ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
               "ln1_scale", "ln1_bias", "w1", "b1", "w2", "b2",
               "ln2_scale", "ln2_bias")}
    for i in range(L):
        for key, stem in (("q", "attention.self.query"), ("k", "attention.self.key"),
                          ("v", "attention.self.value"), ("o", "attention.output.dense")):
            w, b = lin(i, stem)
            layers[f"w{key}"].append(w)
            layers[f"b{key}"].append(b)
        layers["ln1_scale"].append(get(f"encoder.layer.{i}.attention.LayerNorm.weight"))
        layers["ln1_bias"].append(get(f"encoder.layer.{i}.attention.LayerNorm.bias"))
        w, b = lin(i, "intermediate.dense")
        layers["w1"].append(w)
        layers["b1"].append(b)
        w, b = lin(i, "output.dense")
        layers["w2"].append(w)
        layers["b2"].append(b)
        layers["ln2_scale"].append(get(f"encoder.layer.{i}.LayerNorm.weight"))
        layers["ln2_bias"].append(get(f"encoder.layer.{i}.LayerNorm.bias"))
    p["layers"] = {k: _stack(v) for k, v in layers.items()}
    return p


def _layer_norm(x, scale, bias, eps):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _rope_tables(T: int, head_dim: int):
    """[T, head_dim] cos/sin — half-split RoPE (HF rotate_half layout)."""
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    freqs = np.outer(np.arange(T, dtype=np.float64), inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(np.sin(emb), jnp.float32)


def _apply_rope(x, cos, sin):
    # x: [B, H, T, D]; rotate_half: split D in two, (-x2, x1)
    d = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., d:], x[..., :d]], -1)
    return x * cos + rot * sin


def _embed(params: dict, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
           cfg: ESM2Config):
    """Embedding prologue shared by the scan and pipeline paths: token
    embedding with fair-esm token-dropout rescale, padding zeroing, and the
    additive key bias. Returns (x [B,T,hid] f32, kbias [B,1,1,T] f32)."""
    f32 = jnp.float32
    amask = attention_mask.astype(f32)

    x = params["embedding"][input_ids]                            # [B, T, hid] f32
    if cfg.token_dropout:
        is_mask = (input_ids == cfg.mask_token_id)
        x = jnp.where(is_mask[..., None], 0.0, x)
        mask_ratio_train = 0.15 * 0.8
        src_len = jnp.maximum(amask.sum(-1), 1.0)                 # [B]
        ratio_obs = is_mask.astype(f32).sum(-1) / src_len
        x = x * ((1.0 - mask_ratio_train) / (1.0 - ratio_obs))[:, None, None]
    x = x * amask[..., None]

    # additive key bias: large-negative on padded keys (f32 softmax)
    kbias = (amask[:, None, None, :] - 1.0) * 1e9                 # [B, 1, 1, T]
    return x, kbias


def _layer_apply(lp: dict, x: jnp.ndarray, kbias: jnp.ndarray,
                 cos: jnp.ndarray, sin: jnp.ndarray, cfg: ESM2Config) -> jnp.ndarray:
    """One pre-LN ESM-2 transformer block (single layer's params ``lp``)."""
    B, T, _ = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    f32 = jnp.float32
    # f32 mode means f32: XLA's DEFAULT matmul precision runs f32 dots on
    # reduced-precision fast paths (bf16-class passes on the TPU MXU, and
    # oneDNN's fast path on CPU — measured 4.6e-3 error vs 2e-7 at HIGHEST),
    # which would defeat the architecture golden. bf16 mode keeps DEFAULT.
    prec = jax.lax.Precision.HIGHEST if cd == f32 else None

    def dot(a, w, b=None):
        out = jnp.dot(a.astype(cd), w.astype(cd), preferred_element_type=f32,
                      precision=prec)
        return out if b is None else out + b

    ln = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], cfg.layer_norm_eps)
    to_heads = lambda y: y.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    # ESM scales the QUERY by d_h^-0.5 BEFORE rotary (not the logits) —
    # equivalent modulo rotary, and exactly what the checkpoints expect
    q = to_heads(dot(ln, lp["wq"], lp["bq"])) * (D ** -0.5)
    k = to_heads(dot(ln, lp["wk"], lp["bk"]))
    v = to_heads(dot(ln, lp["wv"], lp["bv"]))
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    impl = cfg.attention_impl
    if impl == "auto":
        # flash wins where the [B,H,T,T] plane dominates HBM traffic; its
        # VMEM-resident logits cap T at ~4k (blk_q*T*4 bytes on-chip)
        on_tpu = jax.default_backend().startswith(("tpu", "axon"))
        impl = "flash" if (on_tpu and 1536 <= T <= 4096) else "dense"
    if impl == "flash":
        from packppi_tpu.ops.pallas_attention import flash_mha
        ctx = flash_mha(q.astype(cd), k.astype(cd), v.astype(cd),
                        kbias.reshape(B, T), highest=prec is not None,
                        interpret=jax.default_backend() == "cpu")
    else:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(cd), k.astype(cd),
                            preferred_element_type=f32, precision=prec) + kbias
        w = jax.nn.softmax(logits.astype(f32), axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", w.astype(cd), v.astype(cd),
                         preferred_element_type=f32, precision=prec)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, H * D)
    x = x + dot(ctx, lp["wo"], lp["bo"])

    ln = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], cfg.layer_norm_eps)
    h = jax.nn.gelu(dot(ln, lp["w1"], lp["b1"]), approximate=False)
    return x + dot(h, lp["w2"], lp["b2"])


def esm2_forward(params: dict, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray, cfg: ESM2Config) -> jnp.ndarray:
    """[B, T] ids + 0/1 mask -> [B, T, hidden] last hidden state (post final
    LayerNorm) — ``EsmModel(...).last_hidden_state`` semantics."""
    T = input_ids.shape[1]
    x, kbias = _embed(params, input_ids, attention_mask, cfg)
    cos, sin = _rope_tables(T, cfg.head_dim)                      # [T, D]

    def layer(x, lp):
        return _layer_apply(lp, x, kbias, cos, sin, cfg), None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return _layer_norm(x, params["final_ln_scale"], params["final_ln_bias"],
                       cfg.layer_norm_eps)


def esm2_pipeline_forward(params: dict, input_ids: jnp.ndarray,
                          attention_mask: jnp.ndarray, cfg: ESM2Config,
                          mesh, n_microbatches: int = None) -> jnp.ndarray:
    """``esm2_forward`` with the LAYER axis pipelined over the mesh's 'model'
    axis (GPipe schedule, see parallel/pipeline.py): each stage holds
    num_layers/S consecutive blocks, activations stream stage-to-stage over
    ICI via ppermute. Per-device parameter memory drops S-fold — the scaling
    path for ESM variants too large for one chip's HBM (3B/15B), where
    tensor parallelism alone leaves the layer stack replicated. Output is
    identical to ``esm2_forward`` up to f32 reduction order (tested)."""
    from packppi_tpu.parallel import pipeline_apply

    T = input_ids.shape[1]
    x, kbias = _embed(params, input_ids, attention_mask, cfg)
    cos, sin = _rope_tables(T, cfg.head_dim)

    def apply_layer(lp, carry):
        x, kbias = carry
        return _layer_apply(lp, x, kbias, cos, sin, cfg), kbias

    if n_microbatches is None:
        n_microbatches = max(1, x.shape[0] // max(1, mesh.shape.get("data", 1)))
    x, _ = pipeline_apply(mesh, params["layers"], (x, kbias), apply_layer,
                          n_microbatches=n_microbatches)
    return _layer_norm(x, params["final_ln_scale"], params["final_ln_bias"],
                       cfg.layer_norm_eps)


def esm2_param_shardings(mesh, params: dict):
    """Tensor-parallel sharding spec over the mesh's 'model' axis
    (Megatron-style, expressed as jax.sharding annotations — XLA/GSPMD
    inserts the collectives): q/k/v and FFN-in kernels split on their
    OUTPUT axis, the projection-out and FFN-out kernels on their INPUT
    axis, so each block's matmul pair contracts locally and only the
    block-final psum rides ICI. The out-axis chunks are head-aligned
    whenever (hidden/model_parallel) %% head_dim == 0 (650M: 1280/4 = 5
    heads per device). Embedding table + LayerNorms replicate. Batches
    shard over 'data' — ``jax.jit(esm2_forward)`` with these in_shardings
    runs the 650M encoder across a pod slice unchanged. Use
    ``attention_impl='dense'`` (the default) here: the flash kernel is a
    single-device Pallas call that GSPMD cannot partition — 'auto' only
    selects it on the unsharded extractor path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, None, "model"))  # [L, in, out]: split out
    row = NamedSharding(mesh, P(None, "model", None))  # [L, in, out]: split in
    vec = NamedSharding(mesh, P(None, "model"))        # [L, out]: follows col
    layer_spec = {
        "wq": col, "wk": col, "wv": col, "bq": vec, "bk": vec, "bv": vec,
        "wo": row, "bo": rep, "w1": col, "b1": vec, "w2": row, "b2": rep,
        "ln1_scale": rep, "ln1_bias": rep, "ln2_scale": rep, "ln2_bias": rep,
    }
    return {"embedding": rep, "final_ln_scale": rep, "final_ln_bias": rep,
            "layers": layer_spec}


def make_extractor(params: dict, cfg: ESM2Config):
    """jit-compiled single-sequence embedding extractor.

    Returns ``extract(ids) -> [len(ids), hidden] f32`` (no cls/eos strip —
    callers slice). Pads the token stream to a 128 multiple so recompiles
    bucket by length (the MXU tile quantum), masks the pad tail."""
    fwd = jax.jit(lambda p, ids, m: esm2_forward(p, ids, m, cfg),
                  static_argnums=())

    def extract(ids: np.ndarray) -> np.ndarray:
        n = len(ids)
        T = max(128, -(-n // 128) * 128)
        ids_p = np.full((1, T), cfg.pad_token_id, np.int32)
        ids_p[0, :n] = ids
        mask = np.zeros((1, T), np.float32)
        mask[0, :n] = 1.0
        out = fwd(params, jnp.asarray(ids_p), jnp.asarray(mask))
        return np.asarray(out[0, :n], np.float32)

    return extract
