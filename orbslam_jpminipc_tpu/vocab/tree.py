"""Hierarchical k-ary vocabulary: batched level-wise tree descent.

Replaces DBoW2's TemplatedVocabulary tree transform
(Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1216-1260): the greedy
per-descriptor descent — at each node pick the child with minimum Hamming
distance — becomes a level-synchronous batched program: for all N query
descriptors at once, gather the k children of each current node, compute
the (N, k) pairwise Hamming distances, argmin, advance. Depth L passes of
O(N*k) work replace the flat O(N*W) scan, which is what makes an
ORBvoc-scale vocabulary (k=10, L=6 => ~1M leaf words,
TemplatedVocabulary.h:55-56) tractable: 36 MB of node descriptors on
device and six tiny gathers per transform.

Word ids are leaf indices; tf-idf weights ride per word, exactly like the
reference's setNodeWeights (TF_IDF default, TemplatedVocabulary.h:107).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.hamming import hamming_pairwise


class TreeVocabulary(NamedTuple):
    child_idx: jax.Array    # (n_nodes, k) int32 — child node ids, -1 pad
    node_desc: jax.Array    # (n_nodes, 32) uint8 — node centroid descriptors
    node_word: jax.Array    # (n_nodes,) int32 — word id if leaf else -1
    word_weight: np.ndarray  # (W,) float32 — idf weight per word (host)
    depth: int               # static max depth

    @property
    def n_words(self) -> int:
        return int(self.word_weight.shape[0])

    @property
    def k(self) -> int:
        return int(self.child_idx.shape[1])


@functools.partial(jax.jit, static_argnames=("depth",))
def _descend(desc, child_idx, node_desc, node_word, depth: int):
    """(N, 32) uint8 -> (N,) int32 word ids (leaf indices)."""
    N = desc.shape[0]
    k = child_idx.shape[1]
    cur = jnp.zeros(N, jnp.int32)
    for _ in range(depth):  # static unroll: depth is tiny (<= ~6)
        kids = child_idx[cur]                                    # (N, k)
        # flat 1-D index gather: -1 pads clamp to row 0 (masked below);
        # keeping the index array 1-D and the clamp a cheap max() is what
        # lets XLA emit a vector gather (an ORBvoc-scale level was 26 ms
        # with a clip()-ed 2-D index, 0.04 ms in this form)
        kd = node_desc[jnp.maximum(kids.reshape(-1), 0)].reshape(N, k, 32)
        d = hamming_pairwise(desc[:, None, :], kd)               # (N, k)
        d = jnp.where(kids >= 0, d, 1 << 20)
        best = jnp.argmin(d, axis=1)
        nxt = jnp.take_along_axis(kids, best[:, None], axis=1)[:, 0]
        cur = jnp.where(nxt >= 0, nxt, cur)  # leaves self-loop
    return node_word[cur]


def word_ids(vocab: TreeVocabulary, desc: jax.Array) -> jax.Array:
    return _descend(desc, vocab.child_idx, vocab.node_desc, vocab.node_word,
                    vocab.depth)


def sparse_bow(vocab, wid: np.ndarray, valid: np.ndarray):
    """Host: word ids + validity -> sorted (ids, L1-normalized tf-idf vals).

    Works for TreeVocabulary (word_weight) and the flat Vocabulary (idf).
    """
    w = np.asarray(wid)[np.asarray(valid)]
    w = w[w >= 0]
    ids, counts = np.unique(w, return_counts=True)
    weights = np.asarray(
        vocab.word_weight if hasattr(vocab, "word_weight") else vocab.idf
    )
    vals = counts.astype(np.float32) * weights[ids]
    s = vals.sum()
    if s > 0:
        vals = vals / s
    return ids.astype(np.int32), vals.astype(np.float32)


def build_tree_vocabulary(
    descriptors: np.ndarray,
    k: int = 10,
    depth: int = 4,
    seed: int = 0,
    min_cluster: int = 8,
) -> TreeVocabulary:
    """Hierarchical Hamming k-medians (TemplatedVocabulary::create
    semantics, :570-760, with FORB::meanValue bit-majority centroids).
    Host-side build; the result is device-resident for transform."""
    rng = np.random.default_rng(seed)
    bits_all = np.unpackbits(descriptors, axis=1, bitorder="little")

    child_idx: list[list[int]] = [[]]   # node 0 = root
    node_desc: list[np.ndarray] = [np.zeros(32, np.uint8)]
    node_word: list[int] = [-1]
    weights: list[float] = []

    def kmedians(idx: np.ndarray, kk: int):
        """Cluster descriptor subset into kk groups; returns (assign, centroids)."""
        sub = descriptors[idx]
        bits = bits_all[idx]
        kk = min(kk, len(idx))
        cents = sub[rng.choice(len(idx), kk, replace=False)].copy()
        for _ in range(6):
            # Hamming via popcount of xor — subset sizes are small enough
            # for host numpy here; the device path is for transform only
            d = np.unpackbits(
                cents[None, :, :] ^ sub[:, None, :], axis=2, bitorder="little"
            ).sum(2)
            assign = d.argmin(1)
            sums = np.zeros((kk, 256), np.int64)
            cnt = np.zeros(kk, np.int64)
            np.add.at(sums, assign, bits)
            np.add.at(cnt, assign, 1)
            maj = (sums * 2 > cnt[:, None]).astype(np.uint8)
            empty = np.nonzero(cnt == 0)[0]
            if len(empty):
                maj[empty] = bits[rng.choice(len(idx), len(empty))]
            new = (maj.reshape(-1, 32, 8) << np.arange(8)).sum(2).astype(np.uint8)
            if (new == cents).all():
                break
            cents = new
        return assign, cents

    def split(node: int, idx: np.ndarray, level: int):
        if level >= depth or len(idx) < max(k, min_cluster):
            # leaf: assign the next word id + idf weight from training counts
            node_word[node] = len(weights)
            weights.append(float(np.log(len(descriptors) / max(len(idx), 1))))
            return
        assign, cents = kmedians(idx, k)
        for c in range(len(cents)):
            sel = idx[assign == c]
            if len(sel) == 0:
                continue
            nid = len(node_desc)
            node_desc.append(cents[c])
            node_word.append(-1)
            child_idx.append([])
            child_idx[node].append(nid)
            split(nid, sel, level + 1)

    split(0, np.arange(len(descriptors)), 0)

    kmax = max((len(c) for c in child_idx), default=1) or 1
    ci = np.full((len(node_desc), kmax), -1, np.int32)
    for n, c in enumerate(child_idx):
        ci[n, : len(c)] = c
    return TreeVocabulary(
        child_idx=jnp.array(ci),
        node_desc=jnp.array(np.stack(node_desc)),
        node_word=jnp.array(np.array(node_word, np.int32)),
        word_weight=np.array(weights, np.float32) if weights else np.ones(1, np.float32),
        depth=depth,
    )


def load_dbow2_tree(path: str) -> TreeVocabulary:
    """Load the reference's ORBvoc.txt tree format (loadFromTextFile,
    used at src/main.cc:101). Header: `k L scoring weighting`; then one
    node per line `parent is_leaf b0..b31 weight`, nodes numbered 1.. in
    file order, root = 0 (TemplatedVocabulary.h:1398-1460)."""
    with open(path) as f:
        header = f.readline().split()
        k, L = int(header[0]), int(header[1])
        parents, descs, leaf_w = [], [], []
        for line in f:
            p = line.split()
            if len(p) < 35:
                continue
            parents.append(int(p[0]))
            descs.append([int(x) for x in p[2:34]])
            leaf_w.append(float(p[34]) if int(p[1]) else np.nan)

    n = len(parents) + 1
    node_desc = np.zeros((n, 32), np.uint8)
    node_desc[1:] = np.array(descs, np.uint8)
    node_word = np.full(n, -1, np.int32)
    children: list[list[int]] = [[] for _ in range(n)]
    for i, p in enumerate(parents):
        children[p].append(i + 1)
    weights = []
    wid = 0
    for i, w in enumerate(leaf_w):
        if not np.isnan(w):
            node_word[i + 1] = wid
            weights.append(w)
            wid += 1
    ci = np.full((n, k), -1, np.int32)
    for i, c in enumerate(children):
        ci[i, : min(len(c), k)] = c[:k]
    return TreeVocabulary(
        child_idx=jnp.array(ci),
        node_desc=jnp.array(node_desc),
        node_word=jnp.array(node_word),
        word_weight=np.array(weights, np.float32),
        depth=L + 1,  # DBoW2's L counts levels below root conservatively
    )
