"""Dataflow test with an injected toy model — port of the reference's
TestObjectInference (internal/core/processor_test.go:48-114) — plus the presidio
paragraph (presidio_test.go:21-54) and hash-tagger behavior."""

from ner_backend_ray.core.dsl import parse_query
from ner_backend_ray.core.inference import run_inference_on_doc
from ner_backend_ray.models import PresidioTagger, RegexTagger, build_default_tagger

TEST_DOC = (b"This is a test doc. It contains a phone number: 012-345-6789, "
            b"an email: test@email.com, and a special token a1b2c3.")


def test_object_inference_exact():
    model = RegexTagger({
        "phone": rb"\d{3}-\d{3}-\d{4}",
        "email": rb"\w+@email\.com",
        "test": rb"test",
    })
    res = run_inference_on_doc(
        TEST_DOC, model,
        tags={"phone", "email"},
        custom_patterns={"special_token": rb"(\w\d){3}"},
        group_filters={
            "g1": parse_query('COUNT(phone) > 0 AND email CONTAINS "test"'),
            "g2": parse_query('COUNT(phone) > 1 AND email CONTAINS "test"'),
        },
    )
    phone, email, special = b"012-345-6789", b"test@email.com", b"a1b2c3"
    ps, es, ss = (TEST_DOC.find(phone), TEST_DOC.find(email), TEST_DOC.find(special))
    got = {(m.label, m.text, m.start, m.end, m.lcontext, m.rcontext)
           for m in res.mentions}
    assert got == {
        ("phone", phone, ps, ps + len(phone),
         TEST_DOC[ps - 20:ps], TEST_DOC[ps + len(phone):ps + len(phone) + 20]),
        ("email", email, es, es + len(email),
         TEST_DOC[es - 20:es], TEST_DOC[es + len(email):es + len(email) + 20]),
        ("special_token", special, ss, ss + len(special),
         TEST_DOC[ss - 20:ss], TEST_DOC[ss + len(special):]),
    }
    assert res.groups == ["g1"]
    assert res.tag_count == {"phone": 1, "email": 1}
    assert res.custom_tag_count == {"special_token": 1}
    assert res.token_count == len(TEST_DOC.split())


def test_excluded_tags_dropped():
    model = RegexTagger({"GENDER": rb"male", "NAME": rb"Alice"})
    res = run_inference_on_doc(b"Alice is male.", model)
    assert {m.label for m in res.mentions} == {"NAME"}


def test_allowlist():
    model = RegexTagger({"A": rb"foo", "B": rb"bar"})
    res = run_inference_on_doc(b"foo bar", model, tags={"A"})
    assert {m.label for m in res.mentions} == {"A"}


def test_presidio_paragraph_exact():
    # presidio_test.go:21-54 — exact spans + contexts
    text = (b"The story of Leo Morgan fitness journey began in Boston witnessed by "
            b"their national ID 789-67-4567 and visa permit 56482937 Their tranquil "
            b"abode at 0899 Mark Centers Anthonyfurt, NE 61628 masked the suspense of "
            b"their mother's maiden name, Russell Drop an email to "
            b"sonia41@example.net for more.")
    got = {(e.label, e.text, e.start, e.end, e.lcontext, e.rcontext)
           for e in PresidioTagger().predict(text)}
    assert got == {
        ("SSN", b"789-67-4567", 87, 98, b"y their national ID ", b" and visa permit 564"),
        ("EMAIL", b"sonia41@example.net", 264, 283, b"ll Drop an email to ", b" for more."),
        ("URL", b"example.net", 272, 283, b"an email to sonia41@", b" for more."),
    }


def test_hash_tagger_basics():
    model = build_default_tagger()
    text = b"Saoirse Khan works at Oscorp Holdings in Vancouver.\n"
    res = run_inference_on_doc(text, model)
    got = {(m.label, m.text) for m in res.mentions}
    assert ("NAME", b"Saoirse Khan") in got
    assert ("COMPANY", b"Oscorp Holdings") in got
    assert ("LOCATION", b"Vancouver") in got
    # unknown words stay O
    res2 = run_inference_on_doc(b"completely unrelated plain words here.\n", model)
    assert res2.mentions == []


def test_hash_tagger_validator_interaction():
    model = build_default_tagger()
    # credit score without context words must be dropped by the validator
    res = run_inference_on_doc(b"the number 750 appears alone here.\n", model)
    assert all(m.label != "CREDIT_SCORE" for m in res.mentions)
    res2 = run_inference_on_doc(b"My credit score is 750 and rising.\n", model)
    assert ("CREDIT_SCORE", b"750") in {(m.label, m.text) for m in res2.mentions}


def test_ensemble_majority_vote():
    # ensemble.py:37-92 port: per-token majority; ties → first member's tag;
    # one entity per non-O token (no merging)
    from ner_backend_ray.models import load_tagger
    members = [
        {"model_type": "regex", "model_kwargs": {"patterns": {"A": rb"\bspark\b",
                                                              "C": rb"\bjoin\b"}}},
        {"model_type": "regex", "model_kwargs": {"patterns": {"A": rb"\bspark\b"}}},
        {"model_type": "regex", "model_kwargs": {"patterns": {"B": rb"\bspark\b"}}},
    ]
    model = load_tagger("ensemble", members=members)
    got = [(e.label, e.text, e.start, e.end) for e in
           model.predict(b"run spark then join now")]
    # spark: votes A,A,B -> A; join: votes C,O,O ... majority is O? C:1 O:2 -> O
    assert got == [("A", b"spark", 4, 9)]
    # tie: two members disagree -> first member's tag wins (Counter order)
    model2 = load_tagger("ensemble", members=members[1:])
    got2 = [(e.label, e.text) for e in model2.predict(b"spark")]
    assert got2 == [("A", b"spark")]


def test_finetune_perceptron_corrects_label_conflicts(tmp_path):
    # a token the base vocab labels COMPANY; samples label it LOCATION —
    # plain gazetteer accumulation ties/loses the argmax, the perceptron
    # epochs (Collins 2002) must actually flip the prediction
    from ner_backend_ray.models.hash_tagger import HashEmbeddingTagger

    base = HashEmbeddingTagger([("mercury", "COMPANY"), ("mercury", "COMPANY")],
                               ["the", "near"])
    assert [(e.label, e.text) for e in base.predict(b"we saw mercury rise")] == \
        [("COMPANY", b"mercury")]
    samples = [(["we", "saw", "mercury", "rise"], ["O", "O", "LOCATION", "O"])]
    tuned = base.finetune_and_save(samples, str(tmp_path / "m"))
    assert [(e.label, e.text) for e in tuned.predict(b"we saw mercury rise")] == \
        [("LOCATION", b"mercury")]
    # the artifact round-trips the learned state, not just the vocab
    loaded = HashEmbeddingTagger.load(str(tmp_path / "m"))
    assert [(e.label, e.text) for e in loaded.predict(b"we saw mercury rise")] == \
        [("LOCATION", b"mercury")]
    # base model untouched
    assert [(e.label, e.text) for e in base.predict(b"we saw mercury rise")] == \
        [("COMPANY", b"mercury")]
