"""Binary-descriptor vocabulary: build (k-medians), transform, L1 score.

Replaces DBoW2 TemplatedVocabulary (Thirdparty/DBoW2/DBoW2/
TemplatedVocabulary.h): its hierarchical k-means++ `create` (:570-760, with
FORB::meanValue bit-majority centroids, FORB.cpp:28-77) becomes a flat
Hamming k-medians; its greedy tree `transform` (:1216-1260) becomes an
exact nearest-word assignment via one int8 matmul; scoring is the same
L1 metric s = 1 - 0.5 |v - w|_1 on L1-normalized tf-idf vectors
(ScoringObject.cpp:30-68).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.hamming import hamming_matrix, unpack_bits


class Vocabulary(NamedTuple):
    words: jax.Array    # (W, 32) uint8 — word centroid descriptors
    idf: jax.Array      # (W,) float32 — inverse document frequency weights

    @property
    def n_words(self):
        return self.words.shape[0]


@functools.partial(jax.jit, static_argnames=())
def nearest_word(desc: jax.Array, words: jax.Array) -> jax.Array:
    """(N, 32) uint8 -> (N,) int32 exact nearest word id."""
    return jnp.argmin(hamming_matrix(desc, words), axis=1).astype(jnp.int32)


@jax.jit
def transform(desc: jax.Array, valid: jax.Array, vocab: Vocabulary) -> jax.Array:
    """Descriptors -> dense L1-normalized tf-idf BoW vector (W,)."""
    wid = nearest_word(desc, vocab.words)
    W = vocab.words.shape[0]
    hist = jnp.zeros((W,), jnp.float32).at[wid].add(valid.astype(jnp.float32))
    v = hist * vocab.idf
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-12)


@jax.jit
def score_l1(v: jax.Array, db: jax.Array) -> jax.Array:
    """L1 similarity of a query vector vs a database matrix (K, W):
    s = 1 - 0.5 |v - w|_1 in [0, 1] for L1-normalized inputs."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v[None, :] - db), axis=-1)


# --- the other five DBoW2 scoring variants (ScoringObject.cpp) -------------
# The reference walks two sorted sparse maps; on dense vectors every variant
# is one batched reduction over the word axis. Zero entries contribute
# nothing in each formula, so dense == sparse-intersection semantics.

@jax.jit
def score_l2(v: jax.Array, db: jax.Array) -> jax.Array:
    """L2 similarity (ScoringObject.cpp:73-119): for L2-normalized vectors,
    s = 1 - sqrt(1 - sum(v_i w_i)), clamped to 1 on rounding."""
    dot = db @ v
    return jnp.where(dot >= 1.0, 1.0, 1.0 - jnp.sqrt(jnp.maximum(1.0 - dot, 0.0)))


@jax.jit
def score_chi_square(v: jax.Array, db: jax.Array) -> jax.Array:
    """Chi-square similarity (ScoringObject.cpp:124-168):
    s = 2 sum(v_i w_i / (v_i + w_i)) over words where v_i + w_i > 0."""
    denom = v[None, :] + db
    term = jnp.where(denom > 0, v[None, :] * db / jnp.maximum(denom, 1e-30), 0.0)
    return 2.0 * jnp.sum(term, axis=-1)


_LOG_EPS = float(np.log(np.finfo(np.float64).eps))


@jax.jit
def score_kl(v: jax.Array, db: jax.Array) -> jax.Array:
    """KL divergence of the query from each database vector
    (ScoringObject.cpp:173-221): sum over v_i > 0 of
    v_i log(v_i / w_i), with log(eps) standing in where w_i = 0.
    Lower is more similar (a divergence, 'cannot be scaled')."""
    vi = v[None, :]
    log_v = jnp.where(vi > 0, jnp.log(jnp.maximum(vi, 1e-30)), 0.0)
    log_w = jnp.where(db > 0, jnp.log(jnp.maximum(db, 1e-30)), _LOG_EPS)
    return jnp.sum(jnp.where(vi > 0, vi * (log_v - log_w), 0.0), axis=-1)


@jax.jit
def score_bhattacharyya(v: jax.Array, db: jax.Array) -> jax.Array:
    """Bhattacharyya coefficient (ScoringObject.cpp:227-266):
    s = sum sqrt(v_i w_i) in [0, 1] for L1-normalized inputs."""
    return jnp.sum(jnp.sqrt(jnp.maximum(v[None, :] * db, 0.0)), axis=-1)


@jax.jit
def score_dot(v: jax.Array, db: jax.Array) -> jax.Array:
    """Dot-product similarity (ScoringObject.cpp:272-310)."""
    return db @ v


SCORING = {
    "l1": score_l1,
    "l2": score_l2,
    "chi_square": score_chi_square,
    "kl": score_kl,
    "bhattacharyya": score_bhattacharyya,
    "dot": score_dot,
}


def _majority_centroids(bits: np.ndarray, assign: np.ndarray, k: int) -> np.ndarray:
    """Bit-majority centroid per cluster (FORB::meanValue semantics)."""
    sums = np.zeros((k, 256), np.int64)
    counts = np.zeros(k, np.int64)
    np.add.at(sums, assign, bits)
    np.add.at(counts, assign, 1)
    maj = (sums * 2 > counts[:, None]).astype(np.uint8)
    return maj, counts


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """(N, 256) {0,1} -> (N, 32) uint8, LSB-first (matches unpack_bits)."""
    return (bits.reshape(-1, 32, 8) << np.arange(8)).sum(-1).astype(np.uint8)


def build_vocabulary(
    descriptors: np.ndarray,
    n_words: int = 4096,
    iters: int = 10,
    seed: int = 0,
) -> Vocabulary:
    """Flat Hamming k-medians with k-means++-style seeding.

    descriptors: (N, 32) uint8 training set (N >> n_words). The assignment
    step runs on device (Hamming matmul); centroid updates are host numpy.
    """
    rng = np.random.default_rng(seed)
    n = len(descriptors)
    n_words = min(n_words, n)
    # host unpack: an eager device op here would cost more than the k-medians
    bits = np.unpackbits(descriptors, axis=1, bitorder="little")

    # seeding: random distinct samples (k-means++ with Hamming would cost
    # O(N k) distance passes; random init + iterations converges similarly
    # for the large, near-uniform binary sets used here)
    centroids = descriptors[rng.choice(n, n_words, replace=False)].copy()

    assign_fn = jax.jit(lambda d, w: jnp.argmin(hamming_matrix(d, w), axis=1))
    for _ in range(iters):
        assign = np.asarray(assign_fn(jnp.array(descriptors), jnp.array(centroids)))
        maj, counts = _majority_centroids(bits, assign, n_words)
        # re-seed empty clusters from random points
        empty = np.nonzero(counts == 0)[0]
        if len(empty):
            maj[empty] = bits[rng.choice(n, len(empty))]
        new_centroids = _pack_bits(maj)
        if (new_centroids == centroids).all():
            centroids = new_centroids
            break
        centroids = new_centroids

    # idf from the training corpus (TemplatedVocabulary::setNodeWeights)
    assign = np.asarray(assign_fn(jnp.array(descriptors), jnp.array(centroids)))
    df = np.bincount(assign, minlength=n_words).astype(np.float64)
    idf = np.log(n / np.maximum(df, 1.0)).astype(np.float32)
    return Vocabulary(words=jnp.array(centroids), idf=jnp.array(idf))


def load_dbow2_text(path: str) -> Vocabulary:
    """Load a DBoW2 text vocabulary (the reference's ORBvoc.txt format,
    TemplatedVocabulary::loadFromTextFile — used at src/main.cc:101).

    Header line: `k L scoring weighting`; then one node per line:
    `parent_id is_leaf b0 ... b31 weight`. The flat vocabulary keeps every
    LEAF node as a word with its tf-idf weight — exact nearest-word
    assignment then upper-bounds DBoW2's greedy tree descent in recall.
    """
    words = []
    weights = []
    with open(path) as f:
        header = f.readline().split()
        assert len(header) >= 2, "not a DBoW2 text vocabulary"
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            is_leaf = int(parts[1])
            if not is_leaf:
                continue
            words.append([int(x) for x in parts[2:34]])
            weights.append(float(parts[34]))
    words = np.array(words, np.uint8)
    weights = np.array(weights, np.float32)
    return Vocabulary(words=jnp.array(words), idf=jnp.array(weights))


def save_vocabulary(vocab, path: str):
    """Save a flat Vocabulary or a TreeVocabulary (auto-detected on load)."""
    from . import tree as vtree

    if isinstance(vocab, vtree.TreeVocabulary):
        np.savez_compressed(
            path,
            child_idx=np.asarray(vocab.child_idx),
            node_desc=np.asarray(vocab.node_desc),
            node_word=np.asarray(vocab.node_word),
            word_weight=np.asarray(vocab.word_weight),
            depth=np.int32(vocab.depth),
        )
    else:
        np.savez_compressed(path, words=np.asarray(vocab.words),
                            idf=np.asarray(vocab.idf))


def load_vocabulary(path: str):
    """Load a vocabulary npz; tree-format files (the ORBvoc-scale artifact)
    yield a TreeVocabulary, flat files a Vocabulary."""
    z = np.load(path)
    if "child_idx" in z:
        from . import tree as vtree

        return vtree.TreeVocabulary(
            child_idx=jnp.array(z["child_idx"]),
            node_desc=jnp.array(z["node_desc"]),
            node_word=jnp.array(z["node_word"]),
            word_weight=z["word_weight"].astype(np.float32),
            depth=int(z["depth"]),
        )
    return Vocabulary(words=jnp.array(z["words"]), idf=jnp.array(z["idf"]))
