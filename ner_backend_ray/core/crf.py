"""CRF Viterbi decode, subword→word alignment, and first-non-O aggregation.

Reference semantics: internal/core/onnx.go:40-145 (CRF.ViterbiDecode, getWordIds,
aggregatePredictions). Decode is float32 with first-maximum tie-breaking (the Go loop
keeps the earliest strictly-greater index, which matches numpy argmax).
"""

from __future__ import annotations

import numpy as np


class CRF:
    """Transition/start/end score matrices; onnx.go:40-56."""

    def __init__(self, transitions: np.ndarray, start_probs: np.ndarray, end_probs: np.ndarray):
        self.transitions = np.asarray(transitions, dtype=np.float32)
        self.start_probs = np.asarray(start_probs, dtype=np.float32)
        self.end_probs = np.asarray(end_probs, dtype=np.float32)

    @property
    def num_tags(self) -> int:
        return len(self.transitions)

    def viterbi_decode(self, emissions: np.ndarray) -> list[int]:
        """onnx.go:62-108; emissions shape (seq_len, num_tags), float32."""
        em = np.asarray(emissions, dtype=np.float32)
        seq_len = em.shape[0]
        if seq_len == 0:
            return []
        dp = em[0] + self.start_probs
        bps = np.empty((seq_len, self.num_tags), dtype=np.int64)
        for t in range(1, seq_len):
            # scores[prev, curr] = dp[prev] + T[prev, curr] + em[t][curr]
            scores = dp[:, None] + self.transitions
            best_prev = scores.argmax(axis=0)          # first max, like the Go loop
            dp = scores[best_prev, np.arange(self.num_tags)] + em[t]
            bps[t] = best_prev
        dp = dp + self.end_probs
        seq = [0] * seq_len
        seq[-1] = int(dp.argmax())
        for t in range(seq_len - 1, 0, -1):
            seq[t - 1] = int(bps[t][seq[t]])
        return seq

    def viterbi_decode_batch(self, emissions_list: list[np.ndarray]) -> list[list[int]]:
        """Batched decode, bit-identical per sequence to ``viterbi_decode``: the
        per-timestep numpy kernels amortize over the batch (the per-doc decode is
        dominated by small-array call overhead). Sequences shorter than the batch
        max are frozen once exhausted (masked update)."""
        if not emissions_list:
            return []
        n = self.num_tags
        lens = np.array([e.shape[0] for e in emissions_list], dtype=np.int64)
        bsz = len(emissions_list)
        lmax = int(lens.max())
        if lmax == 0:
            return [[] for _ in emissions_list]
        em = np.zeros((bsz, lmax, n), dtype=np.float32)
        for i, e in enumerate(emissions_list):
            if e.shape[0]:
                em[i, :e.shape[0]] = np.asarray(e, dtype=np.float32)

        dp = em[:, 0, :] + self.start_probs[None, :]
        bps = np.empty((bsz, lmax, n), dtype=np.int64)
        cols = np.arange(n)
        for t in range(1, lmax):
            scores = dp[:, :, None] + self.transitions[None, :, :]   # (B, prev, curr)
            best_prev = scores.argmax(axis=1)                        # first max, as Go
            new_dp = np.take_along_axis(scores, best_prev[:, None, :],
                                        axis=1)[:, 0, :] + em[:, t, :]
            active = lens > t
            dp = np.where(active[:, None], new_dp, dp)
            bps[:, t, :] = best_prev
        dp = dp + self.end_probs[None, :]

        out: list[list[int]] = []
        for i in range(bsz):
            L = int(lens[i])
            if L == 0:
                out.append([])
                continue
            seq = [0] * L
            seq[-1] = int(dp[i].argmax())
            for t in range(L - 1, 0, -1):
                seq[t - 1] = int(bps[i, t, seq[t]])
            out.append(seq)
        return out


def get_word_ids(word_offsets: list[tuple[int, int]], token_offsets: list[tuple[int, int]]) -> list[int]:
    """onnx.go:110-130 — assumes non-overlapping, sorted offsets."""
    word_ids = [0] * len(token_offsets)
    word_id = 0
    n_words = len(word_offsets)
    for i, (tok_start, tok_end) in enumerate(token_offsets):
        while word_id < n_words and word_offsets[word_id][1] <= tok_start:
            word_id += 1
        if word_id < n_words and word_offsets[word_id][0] < tok_end:
            word_ids[i] = word_id
        else:
            word_ids[i] = -1
    return word_ids


def aggregate_predictions(tags: list[str], word_ids: list[int], num_words: int) -> list[str]:
    """onnx.go:132-145 — first non-O subword tag wins per word."""
    preds = ["O"] * num_words
    for tag, wid in zip(tags, word_ids):
        if wid >= 0 and preds[wid] == "O":
            preds[wid] = tag
    return preds
