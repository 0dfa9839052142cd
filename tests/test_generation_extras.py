"""Generation extras: forced BOS, repetition penalty, diverse beam groups,
full translation model-family routing, zero-shot multilabel, Dense layer."""

import numpy as np
import pyarrow as pa
import pytest

from rust_bert_ray.decode.pooling import Dense
from rust_bert_ray.scorers import HashEmbedder
from rust_bert_ray.stages.classify import ZeroShotMultiLabelStage
from rust_bert_ray.stages.generation import (
    EOS,
    DeterministicLM,
    GenerateOptions,
    Generator,
    TranslationStage,
    get_prefix_and_forced_bos,
)

ALL_LANGS = {"en", "fr", "de", "es", "zh"}


def _docs(texts):
    return pa.Table.from_pydict(
        {"doc_id": list(range(len(texts))), "text": texts}
    )


# ------------------------------------------------------------- forced BOS

def test_forced_bos_pins_first_token():
    lm = DeterministicLM()
    lm.vocab = lm.vocab[:-1] + [">>de.<<", EOS]
    lm.eos_id = len(lm.vocab) - 1
    gen = Generator(lm)
    out = gen.generate("data", GenerateOptions(max_length=5, forced_bos_token=">>de.<<"))
    assert out.split()[0] == ">>de.<<"
    # beam path honors it too
    out_beam = gen.generate(
        "data", GenerateOptions(max_length=5, num_beams=3, forced_bos_token=">>de.<<")
    )
    assert out_beam.split()[0] == ">>de.<<"


# ------------------------------------------------------ repetition penalty

def test_repetition_penalty_discourages_repeats():
    gen = Generator()
    base = gen.generate("data", GenerateOptions(max_length=12))
    pen = gen.generate(
        "data", GenerateOptions(max_length=12, repetition_penalty=1000.0)
    )
    # with an extreme penalty no token (incl. prompt) may repeat
    toks = ["data"] + pen.split()
    assert len(toks) == len(set(toks))
    assert base != pen  # the unpenalized output does repeat on this LM


def test_repetition_penalty_ctrl_rule():
    """logit < 0 → multiplied; logit ≥ 0 → divided (generation_utils.rs:476-507)."""
    gen = Generator()
    opts = GenerateOptions(repetition_penalty=2.0)
    logits_raw = gen.lm.logits(["data"])
    logits_pen = gen._step_logits(["data"], opts, n_generated=1)
    i = gen.lm.vocab.index("data")
    expect = logits_raw[i] * 2.0 if logits_raw[i] < 0 else logits_raw[i] / 2.0
    assert logits_pen[i] == pytest.approx(expect)


def test_repetition_penalty_compounds_per_occurrence():
    """The reference re-penalizes once per occurrence in the context
    (enforce_repetition_penalty iterates token ids, not distinct
    tokens, generation_utils.rs:484-505) — k repeats → k applications."""
    gen = Generator()
    opts = GenerateOptions(repetition_penalty=2.0)
    i = gen.lm.vocab.index("data")
    raw = gen.lm.logits(["data", "data"])[i]
    pen = gen._step_logits(["data", "data"], opts, n_generated=1)[i]
    v = raw
    for _ in range(2):
        v = v * 2.0 if v < 0 else v / 2.0
    assert pen == pytest.approx(v)
    single = gen._step_logits(["data"], opts, n_generated=1)[i]
    assert pen != pytest.approx(single)


# ---------------------------------------------------- diverse beam groups

def test_diverse_groups_requires_divisibility():
    gen = Generator()
    with pytest.raises(ValueError, match="divisible"):
        gen.generate(
            "data", GenerateOptions(num_beams=3, num_beam_groups=2)
        )


def test_diverse_groups_match_plain_beam_when_penalty_zero():
    gen = Generator()
    plain = gen.generate("data table", GenerateOptions(max_length=8, num_beams=2))
    grouped = gen.generate(
        "data table",
        GenerateOptions(
            max_length=8, num_beams=4, num_beam_groups=2, diversity_penalty=0.0
        ),
    )
    # group 0 of size 2 behaves like the plain 2-beam search; the global
    # best is at least as good, and with penalty 0 groups are independent
    assert isinstance(grouped, str) and grouped
    assert plain  # smoke: both decode


def test_diversity_penalty_changes_later_groups():
    gen = Generator()
    no_pen = gen.generate(
        "data", GenerateOptions(max_length=6, num_beams=4, num_beam_groups=2,
                                diversity_penalty=0.0)
    )
    with_pen = gen.generate(
        "data", GenerateOptions(max_length=6, num_beams=4, num_beam_groups=2,
                                diversity_penalty=100.0)
    )
    assert isinstance(with_pen, str)
    # a huge penalty must be able to change the winning hypothesis OR the
    # winner comes from group 0 in both cases — assert decode is stable
    assert no_pen and with_pen


# --------------------------------------------------- translation families

def test_marian_prefix_no_bos():
    p, b = get_prefix_and_forced_bos("marian", "en", "fr", {"en"}, ALL_LANGS - {"en"})
    assert p == ">>fr<< " and b is None


def test_t5_task_prefix():
    p, b = get_prefix_and_forced_bos("t5", "en", "de", {"en"}, ALL_LANGS)
    assert p == "translate English to German:" and b is None


def test_mbart_prefix_and_bos():
    p, b = get_prefix_and_forced_bos("mbart50", "en", "fr", {"en"}, ALL_LANGS)
    assert p == ">>en<< " and b == ">>fr<<"


def test_m2m100_dot_codes():
    p, b = get_prefix_and_forced_bos("m2m100", "en", "de", {"en"}, ALL_LANGS)
    assert p == ">>en.<< " and b == ">>de.<<"


def test_nllb_codes():
    # bare NLLB code, no trailing space (translation_pipeline.rs:1487-1494)
    p, b = get_prefix_and_forced_bos("nllb", "en", "fr", {"en"}, ALL_LANGS)
    assert p == "eng_Latn" and b == "fra_Latn"


def test_chinese_mandarin_error_paths():
    # ChineseMandarin has no iso639-1 or NLLB code in the reference
    # (get_iso_639_1_code / get_nllb_code → None → "Missing ... language")
    for family in ("marian", "m2m100", "mbart50", "nllb"):
        with pytest.raises(ValueError, match="Missing target"):
            get_prefix_and_forced_bos(family, "en", "zh", {"en"}, ALL_LANGS)
    # only T5 renders it, via the Display name with the inserted space
    p, b = get_prefix_and_forced_bos("t5", "en", "zh", {"en"}, ALL_LANGS)
    assert p == "translate English to Chinese Mandarin:" and b is None


def test_unsupported_language_raises():
    with pytest.raises(ValueError, match="not in list of supported"):
        get_prefix_and_forced_bos("marian", "en", "xx", {"en"}, {"fr"})
    with pytest.raises(ValueError, match="Missing target"):
        get_prefix_and_forced_bos("mbart50", "en", None, {"en"}, {"fr"})


def test_translation_stage_m2m_forces_bos():
    stage = TranslationStage(target_lang="de", model_type="m2m100")
    out = stage(_docs(["data table row scan merge"]))
    gen = out.column("generated")[0].as_py()
    assert gen.split()[0] == ">>de.<<"


def test_translation_stage_marian_unchanged():
    stage = TranslationStage(target_lang="fr")
    out = stage(_docs(["data table row scan merge"]))
    assert out.num_rows == 1  # text prefix path, no BOS token in output


# -------------------------------------------------- zero-shot multilabel

def test_zero_shot_multilabel_scores_every_label():
    t = _docs(["join filter sort join", "nothing here"])
    out = ZeroShotMultiLabelStage()(t).to_pylist()
    assert len(out) == 2 * 3  # every (doc, label) scored — no threshold
    by = {(r["doc_id"], r["label"]): r["score"] for r in out}
    # doc 0: querying count=4 → sigmoid(2); storage/streaming 0 → sigmoid(-2)
    assert by[(0, "querying")] == pytest.approx(1 / (1 + np.exp(-2.0)), abs=1e-5)
    assert by[(0, "storage")] == pytest.approx(1 / (1 + np.exp(2.0)), abs=1e-5)


# --------------------------------------------------------- Dense layer

def test_dense_projection_shapes_and_activation():
    d = Dense.deterministic(8, 4, activation="tanh")
    x = np.ones((3, 8))
    out = d(x)
    assert out.shape == (3, 4)
    assert (np.abs(out) <= 1.0).all()  # tanh bounds
    # identity activation reproduces the affine map
    d2 = Dense(d.weight, d.bias, activation="identity")
    assert np.allclose(np.tanh(d2(x)), out)


def test_dense_invalid_activation():
    with pytest.raises(ValueError, match="Invalid Activation"):
        Dense(np.eye(4), activation="gelu-ish")


def test_hash_embedder_dense_path_normalized():
    emb = HashEmbedder(dim=64, pooling="mean_sqrt_len",
                       dense=Dense.deterministic(64, 32))
    v = emb.embed("data table row")
    assert v.shape == (32,)
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)
    # mean vs mean_sqrt_len differ pre-normalization but both project to 32
    assert emb.embed_batch(["a", "b"]).shape == (2, 32)


# ------------------------------------------------------- KV-cache engine

def test_kv_cache_o1_context_reads():
    """With the incremental state API the model forward consumes O(1)
    context per step (Cache semantics, generation_utils.rs:226-239) —
    not O(n) re-reads of the full history."""
    from rust_bert_ray.stages.generation import DeterministicLM

    lm = DeterministicLM()
    gen = Generator(lm)
    lm.context_tokens_read = 0
    out = gen.generate("data table row scan", GenerateOptions(max_length=24))
    n_steps = len(out.split()) + 1  # + EOS step
    # prefill reads the 4-token prompt once; each step reads ≤ 2 cached
    # tokens — far below the O(n²) ~ n_steps*(4+n_steps/2) of re-reading
    assert lm.context_tokens_read <= 4 + 2 * n_steps + 2


def test_kv_cache_beam_reorder_matches_stateless():
    """Beam search with per-hypothesis cache gather must produce the
    same output as a backend without the incremental API."""
    from rust_bert_ray.stages.generation import DeterministicLM

    opts = GenerateOptions(min_length=6, max_length=14, num_beams=3,
                           no_repeat_ngram_size=3)
    cached = Generator(DeterministicLM()).generate("summarize: group query part batch", opts)

    gen2 = Generator(DeterministicLM())
    gen2._prefill = lambda tokens: None  # force the stateless path
    stateless = gen2.generate("summarize: group query part batch", opts)
    assert cached == stateless


def test_kv_cache_states_immutable_across_beams():
    from rust_bert_ray.stages.generation import DeterministicLM, LMState

    lm = DeterministicLM()
    s0 = lm.prefill(["a", "b", "c"])
    s1 = lm.step(s0, "x")
    s2 = lm.step(s0, "y")
    assert s0 == LMState(last2=("b", "c"), length=3)
    assert s1.last2 == ("c", "x") and s2.last2 == ("c", "y")
    # diverging beams never alias state
    assert lm.step(s1, "z").last2 == ("x", "z")
    assert s1.last2 == ("c", "x")


# ----------------------------------------------- bad words / returns / scores

def test_bad_words_single_token_never_generated():
    gen = Generator()
    base = gen.generate("data table", GenerateOptions(max_length=12))
    assert base  # something is generated without the ban
    banned_tok = base.split()[0]
    out = gen.generate(
        "data table",
        GenerateOptions(max_length=12, bad_words=[[banned_tok]]),
    )
    assert banned_tok not in out.split()


def test_bad_words_sequence_bans_only_the_continuation():
    gen = Generator()
    base = gen.generate("data table", GenerateOptions(max_length=12)).split()
    # ban the first generated bigram as a SEQUENCE: the pair must vanish,
    # though each token may still appear separately
    a, b = base[0], base[1]
    out = gen.generate(
        "data table",
        GenerateOptions(max_length=12, bad_words=[[a, b]]),
    ).split()
    assert (a, b) not in set(zip(out, out[1:]))


def test_max_new_tokens_budget_and_max_length_priority():
    gen = Generator()
    long = gen.generate("data", GenerateOptions(max_length=12))
    viaa = gen.generate("data", GenerateOptions(max_new_tokens=12))
    assert viaa == long  # same budget path
    short = gen.generate("data", GenerateOptions(max_new_tokens=3))
    assert len(short.split()) <= 3
    # both given: max_length wins (generation_utils.rs:1639-1640)
    both = gen.generate("data", GenerateOptions(max_length=12, max_new_tokens=3))
    assert both == long


def test_num_return_sequences_sampling_deterministic():
    gen = Generator()
    opts = GenerateOptions(
        max_length=8, do_sample=True, top_k=5, seed=11, num_return_sequences=3
    )
    outs1 = gen.generate_full("data table", opts)
    outs2 = gen.generate_full("data table", opts)
    assert [o.text for o in outs1] == [o.text for o in outs2]
    assert len(outs1) == 3
    assert len({o.text for o in outs1}) > 1  # independent draws differ


def test_num_return_sequences_beam_topn_scores_descending():
    gen = Generator()
    opts = GenerateOptions(
        max_length=8, num_beams=4, num_return_sequences=3, output_scores=True
    )
    outs = gen.generate_full("data table", opts)
    assert len(outs) == 3
    scores = [o.score for o in outs]
    assert all(s is not None for s in scores)
    assert scores == sorted(scores, reverse=True)
    # best hypothesis == the plain generate() answer
    assert outs[0].text == gen.generate("data table", GenerateOptions(max_length=8, num_beams=4))


def test_num_return_sequences_validation():
    gen = Generator()
    with pytest.raises(ValueError, match="lower than the number of beams"):
        gen.generate_full(
            "x", GenerateOptions(num_beams=2, num_return_sequences=3)
        )
    with pytest.raises(ValueError, match="greedy"):
        gen.generate_full("x", GenerateOptions(num_return_sequences=2))


def test_output_scores_greedy_length_penalty_algebra():
    gen = Generator()
    s0 = gen.generate_full(
        "data table",
        GenerateOptions(max_length=8, output_scores=True, length_penalty=0.0),
    )[0].score
    s1 = gen.generate_full(
        "data table",
        GenerateOptions(max_length=8, output_scores=True, length_penalty=1.0),
    )[0].score
    s2 = gen.generate_full(
        "data table",
        GenerateOptions(max_length=8, output_scores=True, length_penalty=2.0),
    )[0].score
    assert s0 is not None and s0 < 0  # sum of log-probs
    n = s0 / s1  # emitted length
    assert abs(n - round(n)) < 1e-9 and n >= 1
    assert abs(s2 - s0 / n**2) < 1e-12
    # scores off by default
    assert gen.generate_full("data table", GenerateOptions(max_length=8))[0].score is None
