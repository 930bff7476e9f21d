"""Deterministic numpy transformer encoder — a REAL forward pass for the
encode stage (SURVEY.md M1/M2), with seeded-random weights standing in
for pretrained ones.

The sandbox has no torch and no network, so the reference's HF encode
path (pelinker/util.py:139-209: tokenize -> transformer forward -> layer
pooling -> span mean-pool, models loaded once per process,
pelinker/model.py:1028-1043) cannot load a checkpoint here. What CAN be
real — and is, below — is everything except the weight values:

- subword-style tokenization (char trigrams of the padded surface, the
  typo-robust fastText/CANINE family of public char models; a surface
  with one OCR'd character shares ~90% of its token sequence with the
  canonical form),
- hashed embedding lookup (token -> bucket id -> row of an embedding
  matrix; public "hashing trick" vocabulary),
- sinusoidal positions, pre-LN multi-head self-attention with an
  additive padding mask, GELU feed-forward, residuals, final LayerNorm,
- length-masked mean-pool over positions and an output projection to
  the engine's EMBED_DIM, L2-normalized,
- executor-side batching: strings are deduped per Arrow batch, sorted
  by token length, chunked, and padded per-chunk so the forward pass is
  dense (B, S, D) matmuls — the exact compute shape a GPU/torch body
  would see.

Weights are drawn once per (variant) from a seeded RandomState and
cached per process — the Iterator-UDF "load the model once per
executor" pattern. Swapping `_init_weights` for a checkpoint loader (or
the whole forward for a torch module) changes nothing else in the
engine: the contract stays text -> unit Array<Float>.

Similarity structure: with random-but-shared weights, two surfaces that
share most of their trigram sequence attend over mostly-identical
embeddings and pool to nearby vectors, while unrelated surfaces pool to
near-orthogonal ones — the property the linkage thresholds need, pinned
by tests (tests/test_encoder.py) rather than assumed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# Model shape: small enough that a 32-thread local run can encode ~1e5
# distinct surfaces/s, big enough that the kernel is dominated by the
# same dense matmuls as a production encoder (not by Python overhead).
D_MODEL = 64
N_HEADS = 4
N_LAYERS = 2
D_FF = 128
VOCAB = 4096
MAX_LEN = 48
OUT_DIM = 32  # == scoring.EMBED_DIM; kept literal to avoid an import cycle


def _seed_for(salt: str) -> int:
    return int.from_bytes(
        hashlib.md5(f"pelinker-transformer\x1f{salt}".encode()).digest()[:4],
        "big",
    )


def _init_weights(salt: str) -> dict[str, np.ndarray]:
    """GPT-2-style init (N(0, 0.02), residual projections scaled by
    1/sqrt(2L)), float32 throughout. One dict per variant, cached by
    `_get_model` — the per-executor 'checkpoint'."""
    rng = np.random.RandomState(_seed_for(salt))

    def w(*shape, scale=0.02):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    res = 0.02 / np.sqrt(2.0 * N_LAYERS)
    layers = []
    for _ in range(N_LAYERS):
        layers.append(
            {
                "wq": w(D_MODEL, D_MODEL),
                "wk": w(D_MODEL, D_MODEL),
                "wv": w(D_MODEL, D_MODEL),
                "wo": w(D_MODEL, D_MODEL, scale=res),
                "w1": w(D_MODEL, D_FF),
                "b1": np.zeros(D_FF, np.float32),
                "w2": w(D_FF, D_MODEL, scale=res),
                "b2": np.zeros(D_MODEL, np.float32),
                "ln1_g": np.ones(D_MODEL, np.float32),
                "ln1_b": np.zeros(D_MODEL, np.float32),
                "ln2_g": np.ones(D_MODEL, np.float32),
                "ln2_b": np.zeros(D_MODEL, np.float32),
            }
        )
    # Embeddings at unit-ish scale (they are the signal; attention mixes
    # them), positions at the standard sinusoidal magnitude.
    pos = np.zeros((MAX_LEN, D_MODEL), np.float32)
    p = np.arange(MAX_LEN, dtype=np.float32)[:, None]
    i = np.arange(0, D_MODEL, 2, dtype=np.float32)[None, :]
    ang = p / np.power(10000.0, i / D_MODEL)
    pos[:, 0::2] = np.sin(ang)
    pos[:, 1::2] = np.cos(ang)
    return {
        "emb": w(VOCAB, D_MODEL, scale=1.0),
        "pos": 0.1 * pos,
        "layers": layers,
        "lnf_g": np.ones(D_MODEL, np.float32),
        "lnf_b": np.zeros(D_MODEL, np.float32),
        "proj": w(D_MODEL, OUT_DIM, scale=1.0 / np.sqrt(D_MODEL)),
    }


_MODELS: dict[str, dict] = {}


def _get_model(salt: str) -> dict:
    m = _MODELS.get(salt)
    if m is None:
        m = _MODELS[salt] = _init_weights(salt)
    return m


_GRAM_IDS: dict[str, int] = {}


def _token_ids(s: str) -> np.ndarray:
    """Char-trigram tokens of the cleaned, padded surface, hashed into
    VOCAB buckets (md5 — stable across processes, unlike hash()). Same
    cleaning as the hash encoder's `_features` so both encoders see the
    same typo-robust view of a surface. The trigram->bucket map is
    memoized per process (the trigram space is tiny and heavy-tailed, so
    the md5 cost amortizes to ~zero across a partition)."""
    s = "".join(c for c in s if c.isalnum() or c == " ")
    padded = f"^{s}$"
    n = max(1, len(padded) - 2)
    ids = np.empty(min(n, MAX_LEN), np.int64)
    memo = _GRAM_IDS
    for j in range(ids.shape[0]):
        g = padded[j : j + 3]
        i = memo.get(g)
        if i is None:
            i = memo[g] = (
                int.from_bytes(hashlib.md5(g.encode()).digest()[:4], "big")
                % VOCAB
            )
        ids[j] = i
    return ids


def _layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-5) * g + b


def _gelu(x: np.ndarray) -> np.ndarray:
    # x*x*x, not x**3: np.power routes through the transcendental pow
    # kernel (~7x slower than two multiplies on f32).
    return 0.5 * x * (
        1.0 + np.tanh(0.7978845608 * (x + 0.044715 * (x * x * x)))
    )


def _heads(x2: np.ndarray, w: np.ndarray, B: int, S: int) -> np.ndarray:
    """(B*S, D) @ (D, D) -> contiguous (B*H, S, dh). The 2-D projection
    hits one big BLAS sgemm (a strided 3-D matmul is ~5x slower), and the
    copy to head-major layout keeps the attention batch matmuls on
    contiguous operands."""
    dh = D_MODEL // N_HEADS
    return np.ascontiguousarray(
        (x2 @ w).reshape(B, S, N_HEADS, dh).transpose(0, 2, 1, 3)
    ).reshape(B * N_HEADS, S, dh)


def _forward_chunk(
    model: dict, ids: np.ndarray, mask: np.ndarray
) -> np.ndarray:
    """One dense forward pass. ids: (B, S) int64 bucket ids (pad rows
    arbitrary), mask: (B, S) float32 1=real/0=pad. Returns (B, OUT_DIM)
    unit rows. All matmuls run as 2-D sgemm or contiguous batched 3-D —
    the layout a torch body would use."""
    B, S = ids.shape
    dh = D_MODEL // N_HEADS
    x2 = (model["emb"][ids] + model["pos"][:S][None, :, :]).reshape(
        B * S, D_MODEL
    )
    neg = (1.0 - mask)[:, None, None, :] * np.float32(-1e9)  # (B,1,1,S)
    inv_sqrt_dh = np.float32(1.0 / np.sqrt(dh))
    for ly in model["layers"]:
        h2 = _layer_norm(x2, ly["ln1_g"], ly["ln1_b"])
        q = _heads(h2, ly["wq"], B, S)
        k = _heads(h2, ly["wk"], B, S)
        v = _heads(h2, ly["wv"], B, S)
        att = q @ k.transpose(0, 2, 1) * inv_sqrt_dh  # (B*H, S, S)
        att = att.reshape(B, N_HEADS, S, S)
        att += neg
        att -= att.max(-1, keepdims=True)
        np.exp(att, out=att)
        att /= att.sum(-1, keepdims=True)
        ctx = (
            (att.reshape(B * N_HEADS, S, S) @ v)
            .reshape(B, N_HEADS, S, dh)
            .transpose(0, 2, 1, 3)
            .reshape(B * S, D_MODEL)
        )
        x2 = x2 + ctx @ ly["wo"]
        h2 = _layer_norm(x2, ly["ln2_g"], ly["ln2_b"])
        x2 = x2 + _gelu(h2 @ ly["w1"] + ly["b1"]) @ ly["w2"] + ly["b2"]
    x2 = _layer_norm(x2, model["lnf_g"], model["lnf_b"])
    # Masked mean-pool (pad positions excluded), then project + L2.
    m = mask[:, :, None]
    pooled = (x2.reshape(B, S, D_MODEL) * m).sum(1) / np.maximum(
        m.sum(1), 1.0
    )
    out = pooled @ model["proj"]
    n = np.linalg.norm(out, axis=1, keepdims=True)
    return (out / np.maximum(n, 1e-12)).astype(np.float32)


CHUNK = 256


def encode_batch_transformer(
    texts: pd.Series, salt: str = ""
) -> pd.Series:
    """Arrow-batch body: dedupe strings, tokenize once per distinct
    string, sort by length, pad per CHUNK-sized mini-batch, run the
    dense forward, scatter back. Sorting bounds pad waste (a mini-batch
    of mostly-short surfaces is not padded to the batch's one long
    outlier); the padding mask makes results independent of batch
    composition (pinned by test)."""
    model = _get_model(salt)
    strs = [(s or "") for s in texts]
    distinct = sorted(set(strs), key=lambda s: (len(s), s))
    vecs: dict[str, np.ndarray] = {}
    toks = [_token_ids(s) for s in distinct]
    for lo in range(0, len(distinct), CHUNK):
        chunk = toks[lo : lo + CHUNK]
        S = max(t.shape[0] for t in chunk)
        B = len(chunk)
        ids = np.zeros((B, S), np.int64)
        mask = np.zeros((B, S), np.float32)
        for r, t in enumerate(chunk):
            ids[r, : t.shape[0]] = t
            mask[r, : t.shape[0]] = 1.0
        out = _forward_chunk(model, ids, mask)
        for r in range(B):
            vecs[distinct[lo + r]] = out[r]
    return pd.Series([vecs[s] for s in strs])
