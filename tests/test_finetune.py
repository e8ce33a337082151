"""Finetune seams: CSV sample format parity + distributed (IPM) perceptron.

Reference contract: FinetuneAndSave writes samples to a two-column CSV
(space-joined tokens / labels; internal/core/bolt/bolt_unix.go:152-168) and
trains for ``epochs`` passes (bolt_unix.go:89-133). The distributed variant is
iterative parameter mixing (McDonald, Hall & Mann, NAACL 2010).
"""

import numpy as np
import pytest

from ner_backend_ray.models.finetune import (
    chunk_samples,
    finetune_and_save_csv,
    finetune_perceptron_ipm,
    finetune_streamed,
    read_samples_csv,
    samples_dataset,
    write_samples_csv,
)
from ner_backend_ray.models.hash_tagger import HashEmbeddingTagger


def _conflict_base() -> HashEmbeddingTagger:
    # base vocab says COMPANY; training samples will say LOCATION
    return HashEmbeddingTagger(
        [("mercury", "COMPANY"), ("mercury", "COMPANY"),
         ("venus", "COMPANY"), ("venus", "COMPANY")],
        ["the", "near", "we", "saw", "rise", "set"])


_SAMPLES = [
    (["we", "saw", "mercury", "rise"], ["O", "O", "LOCATION", "O"]),
    (["venus", "set", "near", "mercury"], ["LOCATION", "O", "O", "LOCATION"]),
    (["the", "mercury", "set"], ["O", "LOCATION", "O"]),
    (["we", "saw", "venus"], ["O", "O", "LOCATION"]),
]


def test_samples_csv_roundtrip(tmp_path):
    path = str(tmp_path / "samples.csv")
    write_samples_csv(path, _SAMPLES)
    assert read_samples_csv(path) == _SAMPLES


def test_samples_csv_format_matches_go_writer(tmp_path):
    # Go's csv.Writer: header line, space-joined fields, "\n" terminator,
    # quoting only when a field contains a separator/quote/newline
    path = str(tmp_path / "s.csv")
    write_samples_csv(path, [(["a", "b,c"], ["O", "NAME"])],
                      tokens_col="source", tags_col="target")
    raw = open(path, "rb").read()
    assert raw == b'source,target\n"a b,c",O NAME\n'


def test_samples_csv_rejects_mismatch(tmp_path):
    with pytest.raises(ValueError):
        write_samples_csv(str(tmp_path / "x.csv"), [(["a", "b"], ["O"])])


def test_finetune_and_save_csv_sequential(tmp_path):
    csv_path = str(tmp_path / "samples.csv")
    write_samples_csv(csv_path, _SAMPLES)
    base = _conflict_base()
    tuned = finetune_and_save_csv(base, csv_path, str(tmp_path / "m"))
    assert [(e.label, e.text) for e in tuned.predict(b"we saw mercury rise")] == \
        [("LOCATION", b"mercury")]
    loaded = HashEmbeddingTagger.load(str(tmp_path / "m"))
    assert [(e.label, e.text) for e in loaded.predict(b"venus set near mercury")] == \
        [("LOCATION", b"venus"), ("LOCATION", b"mercury")]


def test_ipm_converges_and_corrects(ray_session):
    base = _conflict_base().finetune(_SAMPLES)
    ds = samples_dataset(_SAMPLES, shards=2)
    tuned, errors = finetune_perceptron_ipm(base, ds, epochs=12)
    assert errors == 0
    for tokens, labels in _SAMPLES:
        text = " ".join(tokens).encode()
        got = {e.text.decode(): e.label for e in tuned.predict(text)}
        want = {t: l for t, l in zip(tokens, labels) if l != "O"}
        assert got == want


def test_ipm_single_shard_equals_sequential(ray_session):
    seq = _conflict_base().finetune(_SAMPLES)
    seq.finetune_perceptron(_SAMPLES, epochs=12)
    ipm_base = _conflict_base().finetune(_SAMPLES)
    ds = samples_dataset(_SAMPLES, shards=1)
    ipm, errors = finetune_perceptron_ipm(ipm_base, ds, epochs=12)
    assert errors == 0
    # one shard, uniform mixing with divisor 1 → same weight trajectory
    assert set(seq._learned) == set(ipm._learned)
    for b in seq._learned:
        np.testing.assert_allclose(seq._learned[b], ipm._learned[b])


def test_ipm_deterministic_across_runs(ray_session):
    outs = []
    for _ in range(2):
        base = _conflict_base().finetune(_SAMPLES)
        ds = samples_dataset(_SAMPLES, shards=3)
        tuned, _ = finetune_perceptron_ipm(base, ds, epochs=12)
        outs.append({b: v.tolist() for b, v in sorted(tuned._learned.items())})
    assert outs[0] == outs[1]


def test_finetune_and_save_csv_distributed(ray_session, tmp_path):
    csv_path = str(tmp_path / "samples.csv")
    write_samples_csv(csv_path, _SAMPLES)
    tuned = finetune_and_save_csv(_conflict_base(), csv_path,
                                  str(tmp_path / "m"), distributed=True,
                                  shards=2)
    loaded = HashEmbeddingTagger.load(str(tmp_path / "m"))
    assert [(e.label, e.text) for e in loaded.predict(b"we saw mercury rise")] == \
        [("LOCATION", b"mercury")]


# ------------------- bounded-payload streaming (model.go:91-157) -------------------

def test_chunk_samples_greedy_boundary():
    # budget 10 bytes; samples of est size 4 each ("ab"+"cd" tokens=4B, labels
    # "O","O"=2B → 6B). 6+6 > 10 → each sample flushes the previous one.
    s = (["ab", "cd"], ["O", "O"])  # est = 4 + 2 = 6
    chunks = chunk_samples([s, s, s], max_payload=10)
    assert [len(c) for c in chunks] == [1, 1, 1]
    # budget 12 fits exactly two (6+6 == 12, the Go check is strict >)
    chunks = chunk_samples([s, s, s], max_payload=12)
    assert [len(c) for c in chunks] == [2, 1]


def test_chunk_samples_oversized_sample_ships_alone():
    big = (["x" * 100], ["LOCATION"])  # est 108 > budget
    small = (["a"], ["O"])             # est 2
    chunks = chunk_samples([small, big, small], max_payload=50)
    assert chunks == [[small], [big], [small]]


def test_chunk_samples_concat_preserves_order():
    samples = [([f"t{i}"], ["O"]) for i in range(37)]
    chunks = chunk_samples(samples, max_payload=16)
    assert [x for c in chunks for x in c] == samples
    # every chunk except possibly a lone-oversized one respects the budget
    for c in chunks:
        est = sum(len(t) for toks, labs in c for t in toks) + \
              sum(len(l) for toks, labs in c for l in labs)
        assert est <= 16 or len(c) == 1


def test_finetune_streamed_equals_bulk(tmp_path):
    # the gazetteer accumulation is append-order-sensitive only within one
    # pass; chunking an epoch's (shuffled) order must produce the identical
    # model to one bulk call on that order — chunk size must not matter
    base = _conflict_base()
    rng = np.random.default_rng(7)
    bulk = base
    for _ in range(3):
        order = rng.permutation(len(_SAMPLES))
        bulk = bulk.finetune([_SAMPLES[i] for i in order])
    streamed = finetune_streamed(base, _SAMPLES, epochs=3, seed=7,
                                 max_payload=8)  # forces multi-chunk epochs
    assert streamed._vocab == bulk._vocab
    assert streamed._o_vocab == bulk._o_vocab
    texts = [b"we saw mercury rise", b"venus set near the mercury"]
    for t in texts:
        assert [(e.label, e.text) for e in streamed.predict(t)] == \
            [(e.label, e.text) for e in bulk.predict(t)]


def test_finetune_streamed_saves(tmp_path):
    out = str(tmp_path / "streamed_model")
    m = finetune_streamed(_conflict_base(), _SAMPLES, save_dir=out, epochs=2)
    loaded = HashEmbeddingTagger.load(out)
    assert [(e.label, e.text) for e in loaded.predict(b"we saw mercury rise")] == \
        [(e.label, e.text) for e in m.predict(b"we saw mercury rise")]
