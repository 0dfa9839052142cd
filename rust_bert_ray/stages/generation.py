"""Text-generation family: free generation, summarization, translation.

Mirrors the decode semantics of
/root/reference/src/pipelines/generation_utils.rs behind a deterministic
LM (hash-based next-token logits — drop-in replaceable by a real model):

- greedy + multinomial sampling with temperature
  (generation_utils.rs:948-963), seeded for reproducibility;
- top-k and top-p (nucleus) logit filtering (generation_utils.rs:555-614);
- ``no_repeat_ngram_size`` banning (same semantics: an n-gram may not
  repeat within one hypothesis);
- beam search with ``BeamHypotheses``: length-penalized score
  ``logp / len**length_penalty``, ``early_stopping``, worst-score pruning
  (generation_utils.rs:1059-1591, 2294-2365);
- ``prefix_allowed_tokens_fn`` constrained decoding hook
  (generation_utils.rs:922-929);
- ``min_length`` masks EOS before the floor (as the reference's
  MinLengthCriterion/logit processor does).

Task pipelines on top:

- ``SummarizationStage`` — prepends the T5 task prefix ``"summarize: "``
  (/root/reference/src/pipelines/summarization.rs:407-410); defaults
  min_length=56 max_length=142 num_beams=3 analog (summarization.rs:160-164)
  scaled down by ``length_scale`` for test corpora;
- ``TranslationStage`` — Marian-style ``>>xx<<`` target-language text
  prefix with supported-language validation
  (/root/reference/src/pipelines/translation/translation_pipeline.rs:1479-1496).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np
import pyarrow as pa

EOS = "</s>"


def _crc(s: str) -> int:
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


@dataclass(frozen=True)
class LMState:
    """Opaque incremental decoder state — the ``Cache`` analog
    (/root/reference/src/pipelines/generation_utils.rs:226-239).

    A real transformer backend stores per-layer past key/values here; the
    deterministic bigram LM stores exactly what its forward needs (the
    last two tokens + context length), so each decode step consumes O(1)
    state instead of re-reading the full history.  States are immutable:
    ``step`` returns a NEW state, which is what makes beam-search cache
    reordering (generation_utils.rs:1059-1591 ``reorder_cache``) a plain
    gather of parent states.
    """

    last2: tuple[str, ...]
    length: int


class DeterministicLM:
    """Hash-driven bigram-ish LM over a fixed vocab (the "model" backend).

    Exposes BOTH the stateless ``logits(tokens)`` interface and the
    KV-cache-shaped incremental one (``prefill``/``step``/
    ``logits_from_state``).  The Generator prefers the incremental path;
    a backend lacking it falls back to full-context calls.
    ``context_tokens_read`` counts tokens consumed by forwards — the
    O(1)-per-step evidence used by tests.
    """

    def __init__(self, vocab: list[str] | None = None):
        base = vocab if vocab is not None else [
            "data", "table", "row", "batch", "stream", "query", "join", "merge",
            "fast", "slow", "window", "sort", "hash", "scan", "group", "value",
        ]
        self.vocab = base + [EOS]
        self.eos_id = len(self.vocab) - 1
        self.context_tokens_read = 0

    def _logits_for(self, last2: tuple[str, ...], length: int) -> np.ndarray:
        self.context_tokens_read += len(last2)
        ctx = "\x00".join(last2)
        out = np.empty(len(self.vocab), dtype=np.float64)
        for i, tok in enumerate(self.vocab):
            out[i] = (_crc(f"{ctx}|{tok}") % 1000) / 100.0
        # EOS pressure grows with length so sequences terminate
        out[self.eos_id] += 0.02 * length
        return out

    def logits(self, tokens: list[str]) -> np.ndarray:
        """Next-token logits given the full context (stateless path)."""
        self.context_tokens_read += max(0, len(tokens) - 2)  # re-read cost
        return self._logits_for(tuple(tokens[-2:]), len(tokens))

    # ------------------------------------------- incremental (KV-cache)

    def prefill(self, tokens: list[str]) -> LMState:
        """Consume the prompt once → initial decoder state."""
        self.context_tokens_read += len(tokens)
        return LMState(last2=tuple(tokens[-2:]), length=len(tokens))

    def step(self, state: LMState, token: str) -> LMState:
        """Advance the cache by ONE token (O(1))."""
        last2 = (state.last2 + (token,))[-2:]
        return LMState(last2=last2, length=state.length + 1)

    def logits_from_state(self, state: LMState) -> np.ndarray:
        """Forward from cached state — never re-reads the history."""
        return self._logits_for(state.last2, state.length)


def top_k_top_p_filter(logits: np.ndarray, top_k: int = 0, top_p: float = 1.0) -> np.ndarray:
    """generation_utils.rs:555-614 semantics: keep top-k, then the smallest
    prefix of the sorted distribution whose cumulative prob ≥ top_p."""
    out = logits.copy()
    if top_k > 0:
        kth = np.sort(out)[-min(top_k, out.shape[0])]
        out[out < kth] = -np.inf
    if top_p < 1.0:
        order = np.argsort(-out)
        probs = np.exp(out[order] - np.max(out))
        probs = probs / probs.sum()
        cum = np.cumsum(probs)
        cutoff = int(np.searchsorted(cum, top_p)) + 1
        banned = order[cutoff:]
        out[banned] = -np.inf
    return out


def _banned_ngram_tokens(tokens: list[str], n: int) -> set[str]:
    """Tokens that would complete an already-seen n-gram."""
    if n <= 0 or len(tokens) < n - 1:
        return set()
    prefix = tuple(tokens[-(n - 1) :]) if n > 1 else ()
    banned = set()
    for i in range(len(tokens) - n + 1):
        if tuple(tokens[i : i + n - 1]) == prefix:
            banned.add(tokens[i + n - 1])
    return banned


@dataclass
class GenerateOptions:
    """Per-call overrides (generation_utils.rs:1633-1703 analog)."""

    # max_length bounds GENERATED tokens here (the encoder-decoder
    # convention: cur_len starts at 1, generation_utils.rs:2016-2021).
    # None defers to max_new_tokens, then to the default of 20 — when
    # both are given max_length wins, mirroring the reference's rule
    # (generation_utils.rs:1639-1640, 2099-2102).
    max_length: Optional[int] = None
    max_new_tokens: Optional[int] = None
    min_length: int = 0
    num_beams: int = 1
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    no_repeat_ngram_size: int = 0
    length_penalty: float = 1.0
    early_stopping: bool = True
    seed: int = 42
    prefix_allowed_tokens_fn: Optional[Callable[[list[str]], list[str]]] = None
    # CTRL-style repetition penalty (generation_utils.rs:476-507): logits of
    # already-seen tokens are multiplied (if negative) / divided (if
    # positive) by the penalty.  1.0 = off.
    repetition_penalty: float = 1.0
    # Diverse beam search (generation_utils.rs:615-648): beams split into
    # groups; each group's logits are penalized by diversity_penalty ×
    # (count of tokens already chosen by earlier groups at this step).
    num_beam_groups: int = 1
    diversity_penalty: float = 0.0
    # Forced decoder BOS (translation_pipeline.rs:1239-1263): the FIRST
    # generated token is pinned (MBart/M2M100/NLLB target-language token).
    forced_bos_token: Optional[str] = None
    # Banned token sequences (generation_utils.rs:674-800,884-900): a
    # length-1 entry is banned at every step (static mask); for longer
    # entries the LAST token is banned whenever the sequence so far ends
    # with the entry's prefix (tokens_match suffix rule, :706-714).
    bad_words: Optional[list[list[str]]] = None
    # Number of sequences returned per prompt (generate_full):
    # independent samples when do_sample, the top-n finished hypotheses
    # under beam search (must be <= num_beams, :208), and exactly 1 for
    # greedy (:204) — generation_utils.rs:1470-1530 semantics.
    num_return_sequences: int = 1
    # Attach a score to each returned sequence: beam = the hypothesis
    # score logp/len^length_penalty; greedy/sampling = sum of the chosen
    # tokens' log-softmax (of the PROCESSED logits, :965-973) divided by
    # emitted length^length_penalty (:1029-1037).
    output_scores: bool = False

    def budget(self) -> int:
        """Effective generated-token budget (max_length > max_new_tokens > 20)."""
        if self.max_length is not None:
            return self.max_length
        if self.max_new_tokens is not None:
            return self.max_new_tokens
        return 20


@dataclass
class GeneratedTextOutput:
    """generation_utils.rs:1606-1611 analog (score None unless
    ``output_scores``)."""

    text: str
    score: Optional[float] = None


@dataclass
class _Hyp:
    tokens: list[str]
    logp: float
    # per-hypothesis decoder cache; beam selection gathers parent states
    # (the reference's reorder_cache, generation_utils.rs:1059-1591)
    state: object = None


class BeamHypotheses:
    """generation_utils.rs:2294-2365: keep num_beams best finished hyps."""

    def __init__(self, num_beams: int, length_penalty: float, early_stopping: bool):
        self.num_beams = num_beams
        self.length_penalty = length_penalty
        self.early_stopping = early_stopping
        self.hyps: list[tuple[float, _Hyp]] = []

    def score(self, h: _Hyp) -> float:
        return h.logp / max(1, len(h.tokens)) ** self.length_penalty

    def add(self, h: _Hyp) -> None:
        s = self.score(h)
        self.hyps.append((s, h))
        self.hyps.sort(key=lambda t: -t[0])
        if len(self.hyps) > self.num_beams:
            self.hyps.pop()

    def is_done(self, best_possible: float) -> bool:
        if len(self.hyps) < self.num_beams:
            return False
        if self.early_stopping:
            return True
        return self.hyps[-1][0] >= best_possible


class Generator:
    """Greedy / sampling / beam decode over any LM with a .logits() method."""

    def __init__(self, lm: DeterministicLM | None = None):
        self.lm = lm if lm is not None else DeterministicLM()

    def _vocab_index(self) -> dict[str, int]:
        idx = getattr(self, "_vocab_index_cache", None)
        if idx is None or len(idx) != len(self.lm.vocab):
            idx = {tok: i for i, tok in enumerate(self.lm.vocab)}
            self._vocab_index_cache = idx
        return idx

    def _step_logits(
        self,
        tokens: list[str],
        opts: GenerateOptions,
        n_generated: int = -1,
        state=None,
    ) -> np.ndarray:
        if state is not None and hasattr(self.lm, "logits_from_state"):
            # KV-cache path: the model forward reads the cache, never the
            # full history; the logit PROCESSORS below still see the full
            # hypothesis tokens (they are sequence-level, like the
            # reference's LogitsProcessorList)
            logits = self.lm.logits_from_state(state)
        else:
            logits = self.lm.logits(tokens)
        if opts.forced_bos_token is not None and n_generated == 0:
            # pin the first generated token (forced decoder BOS)
            want = self.lm.vocab.index(opts.forced_bos_token)
            logits = np.full_like(logits, -np.inf)
            logits[want] = 0.0
            return logits
        if opts.repetition_penalty != 1.0:
            # Per-occurrence compounding: the reference's
            # enforce_repetition_penalty (generation_utils.rs:484-505)
            # re-reads and re-penalizes the logit once per *occurrence*
            # of a token in the context, so a token repeated k times is
            # penalized k times over.
            vocab_index = self._vocab_index()
            for tok in tokens:
                i = vocab_index.get(tok)
                if i is None:
                    continue
                logits[i] = (
                    logits[i] * opts.repetition_penalty
                    if logits[i] < 0
                    else logits[i] / opts.repetition_penalty
                )
        if opts.bad_words:
            vocab_index = self._vocab_index()
            for bw in opts.bad_words:
                if not bw:
                    continue
                if len(bw) == 1:
                    i = vocab_index.get(bw[0])
                    if i is not None:
                        logits[i] = -np.inf
                else:
                    pre = bw[:-1]
                    # tokens_match (generation_utils.rs:706-714): ban the
                    # final token when the sequence ends with the prefix
                    if len(pre) <= len(tokens) and tokens[len(tokens) - len(pre):] == pre:
                        i = vocab_index.get(bw[-1])
                        if i is not None:
                            logits[i] = -np.inf
        if opts.min_length and len(tokens) < opts.min_length:
            logits[self.lm.eos_id] = -np.inf
        if opts.no_repeat_ngram_size:
            banned = _banned_ngram_tokens(tokens, opts.no_repeat_ngram_size)
            for i, tok in enumerate(self.lm.vocab):
                if tok in banned:
                    logits[i] = -np.inf
        if opts.prefix_allowed_tokens_fn is not None:
            allowed = set(opts.prefix_allowed_tokens_fn(tokens))
            for i, tok in enumerate(self.lm.vocab):
                if tok not in allowed:
                    logits[i] = -np.inf
        return logits

    def generate(self, prompt: str, opts: GenerateOptions | None = None) -> str:
        opts = opts or GenerateOptions()
        prompt_tokens = prompt.split() if prompt else []
        if opts.num_beams > 1 and opts.num_beam_groups > 1:
            out = self._beam_grouped(prompt_tokens, opts)
        elif opts.num_beams > 1:
            out = self._beam(prompt_tokens, opts)
        else:
            out, _ = self._greedy_or_sample(prompt_tokens, opts)
        return " ".join(out)

    def generate_full(
        self, prompt: str, opts: GenerateOptions | None = None
    ) -> list[GeneratedTextOutput]:
        """num_return_sequences × (text, score) per prompt — the
        reference's generate() → Vec<GeneratedTextOutput> surface
        (generation_utils.rs:1774-1793, selection :1470-1530)."""
        opts = opts or GenerateOptions()
        prompt_tokens = prompt.split() if prompt else []
        n = opts.num_return_sequences
        if opts.num_beams > 1:
            if n > opts.num_beams:
                raise ValueError(
                    "num_return_sequences must be lower than the number of beams"
                )
            hyps = (
                self._beam_grouped_all(prompt_tokens, opts)
                if opts.num_beam_groups > 1
                else self._beam_all(prompt_tokens, opts)
            )
            return [
                GeneratedTextOutput(
                    " ".join(toks), score if opts.output_scores else None
                )
                for score, toks in hyps[:n]
            ]
        if opts.do_sample:
            rng = np.random.default_rng(opts.seed)
            outs = []
            for _ in range(n):
                toks, score = self._greedy_or_sample(prompt_tokens, opts, rng=rng)
                outs.append(GeneratedTextOutput(" ".join(toks), score))
            return outs
        if n != 1:
            raise ValueError(
                "num_return_sequences must be set to 1 for greedy decoding"
            )
        toks, score = self._greedy_or_sample(prompt_tokens, opts)
        return [GeneratedTextOutput(" ".join(toks), score)]

    def _prefill(self, tokens: list[str]):
        if hasattr(self.lm, "prefill"):
            return self.lm.prefill(tokens)
        return None

    def _advance(self, state, token: str):
        if state is not None and hasattr(self.lm, "step"):
            return self.lm.step(state, token)
        return None

    def _greedy_or_sample(
        self,
        prompt: list[str],
        opts: GenerateOptions,
        rng: np.random.Generator | None = None,
    ) -> tuple[list[str], Optional[float]]:
        rng = rng if rng is not None else np.random.default_rng(opts.seed)
        tokens = list(prompt)
        state = self._prefill(tokens)
        total_lp, n_emitted = 0.0, 0
        for step in range(opts.budget()):
            logits = self._step_logits(tokens, opts, n_generated=step, state=state)
            if opts.do_sample:
                logits = top_k_top_p_filter(
                    logits / max(opts.temperature, 1e-9), opts.top_k, opts.top_p
                )
                probs = np.exp(logits - np.max(logits))
                probs[np.isnan(probs)] = 0.0
                probs = probs / probs.sum()
                idx = int(rng.choice(len(probs), p=probs))
            else:
                idx = int(np.argmax(logits))
            if opts.output_scores:
                # log-softmax of the PROCESSED logits at the chosen token
                # (generation_utils.rs:965-973); the terminating EOS is
                # scored and counted like any emitted token
                m = float(np.max(logits))
                total_lp += float(logits[idx]) - m - float(
                    np.log(np.exp(logits - m).sum())
                )
                n_emitted += 1
            tok = self.lm.vocab[idx]
            if tok == EOS:
                break
            tokens.append(tok)
            state = self._advance(state, tok)
        score = None
        if opts.output_scores:
            score = total_lp / max(1, n_emitted) ** opts.length_penalty
        return tokens[len(prompt) :], score

    def _beam(self, prompt: list[str], opts: GenerateOptions) -> list[str]:
        beams: list[_Hyp] = [_Hyp(list(prompt), 0.0, state=self._prefill(prompt))]
        done = BeamHypotheses(opts.num_beams, opts.length_penalty, opts.early_stopping)
        for _step in range(opts.budget()):
            candidates: list[_Hyp] = []
            for h in beams:
                logits = self._step_logits(
                    h.tokens, opts, n_generated=_step, state=h.state
                )
                logp = logits - np.log(np.exp(logits - logits.max()).sum()) - logits.max()
                # top 2×beams successors per beam (reference keeps 2×beams);
                # each successor carries its parent's advanced cache — the
                # reorder_cache gather happens here, not as a post-pass
                for idx in np.argsort(-logp)[: 2 * opts.num_beams]:
                    tok = self.lm.vocab[int(idx)]
                    nh = _Hyp(
                        h.tokens + [tok],
                        h.logp + float(logp[idx]),
                        state=self._advance(h.state, tok),
                    )
                    candidates.append(nh)
            candidates.sort(key=lambda h: -h.logp)
            beams = []
            for c in candidates:
                if c.tokens[-1] == EOS:
                    done.add(_Hyp(c.tokens[:-1], c.logp))
                else:
                    beams.append(c)
                if len(beams) >= opts.num_beams:
                    break
            if not beams:
                break
            best_possible = max(h.logp for h in beams) / max(
                1, len(beams[0].tokens)
            ) ** opts.length_penalty
            if done.is_done(best_possible):
                break
        for h in beams:
            done.add(h)
        self._last_beam_hyps = done
        best = done.hyps[0][1]
        return best.tokens[len(prompt) :]

    def _beam_all(
        self, prompt: list[str], opts: GenerateOptions
    ) -> list[tuple[float, list[str]]]:
        """All finished hypotheses, best first (the reference's sorted
        pop loop, generation_utils.rs:1494-1504)."""
        self._beam(prompt, opts)
        done: BeamHypotheses = self._last_beam_hyps
        return [(s, h.tokens[len(prompt):]) for s, h in done.hyps]

    def _beam_grouped_all(
        self, prompt: list[str], opts: GenerateOptions
    ) -> list[tuple[float, list[str]]]:
        self._beam_grouped(prompt, opts)
        groups: list[BeamHypotheses] = self._last_group_hyps
        merged = sorted(
            (t for d in groups for t in d.hyps), key=lambda t: -t[0]
        )
        return [(s, h.tokens[len(prompt):]) for s, h in merged]

    def _beam_grouped(self, prompt: list[str], opts: GenerateOptions) -> list[str]:
        """Diverse beam search (generation_utils.rs:615-648 semantics):
        ``num_beams`` split into ``num_beam_groups`` groups decoded in
        order within each step; group g's logits are penalized by
        ``diversity_penalty × count(token chosen by groups < g at this
        step)`` — the hamming diversity penalty.  Each group keeps its own
        ``BeamHypotheses``; the global best across groups wins."""
        if opts.num_beams % opts.num_beam_groups != 0:
            raise ValueError(
                f"num_beams ({opts.num_beams}) must be divisible by "
                f"num_beam_groups ({opts.num_beam_groups})"
            )
        n_groups = opts.num_beam_groups
        group_size = opts.num_beams // n_groups
        vocab_index = {tok: i for i, tok in enumerate(self.lm.vocab)}
        groups: list[list[_Hyp]] = [
            [_Hyp(list(prompt), 0.0, state=self._prefill(prompt))]
            for _ in range(n_groups)
        ]
        done = [
            BeamHypotheses(group_size, opts.length_penalty, opts.early_stopping)
            for _ in range(n_groups)
        ]
        for _step in range(opts.budget()):
            step_counts: dict[str, int] = {}
            any_alive = False
            for gi in range(n_groups):
                beams = groups[gi]
                if not beams:
                    continue
                candidates: list[_Hyp] = []
                for h in beams:
                    logits = self._step_logits(
                        h.tokens, opts, n_generated=_step, state=h.state
                    )
                    if gi > 0 and opts.diversity_penalty > 0.0:
                        for tok, cnt in step_counts.items():
                            logits[vocab_index[tok]] -= opts.diversity_penalty * cnt
                    logp = (
                        logits
                        - np.log(np.exp(logits - logits.max()).sum())
                        - logits.max()
                    )
                    for idx in np.argsort(-logp)[: 2 * group_size]:
                        tok = self.lm.vocab[int(idx)]
                        candidates.append(
                            _Hyp(
                                h.tokens + [tok],
                                h.logp + float(logp[idx]),
                                state=self._advance(h.state, tok),
                            )
                        )
                candidates.sort(key=lambda h: -h.logp)
                new_beams: list[_Hyp] = []
                for c in candidates:
                    if c.tokens[-1] == EOS:
                        done[gi].add(_Hyp(c.tokens[:-1], c.logp))
                    else:
                        new_beams.append(c)
                    if len(new_beams) >= group_size:
                        break
                for b in new_beams:
                    last = b.tokens[-1]
                    step_counts[last] = step_counts.get(last, 0) + 1
                groups[gi] = new_beams
                if new_beams:
                    best_possible = max(h.logp for h in new_beams) / max(
                        1, len(new_beams[0].tokens)
                    ) ** opts.length_penalty
                    if done[gi].is_done(best_possible):
                        groups[gi] = []
                    else:
                        any_alive = True
            if not any_alive:
                break
        for gi in range(n_groups):
            for h in groups[gi]:
                done[gi].add(h)
        self._last_group_hyps = done
        finished = [d.hyps[0] for d in done if d.hyps]
        best = max(finished, key=lambda t: t[0])[1]
        return best.tokens[len(prompt) :]


# ------------------------------------------------------------- task stages

GEN_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("generated", pa.string()), ("n_tokens", pa.int32())]
)


class TextGenerationStage:
    """documents → free generation continuing each doc's first words.

    ``tokenizer`` (optional) routes prompt construction through a real
    subword tokenizer (WordPiece / byte-level BPE — anything with
    ``encode``/``decode``): the prompt becomes the decode of the pieces
    covering the first ``prompt_words`` pretokens, mirroring how the
    reference's generation pipelines tokenize their inputs
    (common.rs:1332-1396) rather than whitespace-splitting."""

    def __init__(
        self,
        opts: GenerateOptions | None = None,
        prompt_words: int = 4,
        tokenizer=None,
    ):
        self.generator = Generator()
        self.opts = opts or GenerateOptions(max_length=16, no_repeat_ngram_size=3)
        self.prompt_words = prompt_words
        self.tokenizer = tokenizer

    def _prompt(self, text: str) -> str:
        if self.tokenizer is not None:
            enc = self.tokenizer.encode(text)
            ids = [
                i for i, w in zip(enc.ids, enc.word_indices)
                if w < self.prompt_words
            ]
            return " ".join(self.tokenizer.decode(ids).split())
        return " ".join(text.split()[: self.prompt_words])

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {n: [] for n in GEN_SCHEMA.names}
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            out = self.generator.generate(self._prompt(text), self.opts)
            rows["doc_id"].append(doc_id)
            rows["generated"].append(out)
            rows["n_tokens"].append(len(out.split()) if out else 0)
        return pa.Table.from_pydict(rows, schema=GEN_SCHEMA)


class SummarizationStage(TextGenerationStage):
    """T5-style: prepend ``"summarize: "`` (summarization.rs:407-410)."""

    PREFIX = "summarize: "

    def __init__(self, opts: GenerateOptions | None = None):
        super().__init__(
            opts
            or GenerateOptions(
                min_length=6, max_length=14, num_beams=3, no_repeat_ngram_size=3
            )
        )

    def _prompt(self, text: str) -> str:
        return self.PREFIX + " ".join(text.split()[: self.prompt_words])


# key → (Display name, iso639-1 code, NLLB code) for the supported set.
# ``None`` codes mirror the reference's ``get_iso_639_1_code`` /
# ``get_nllb_code`` returning None (translation_pipeline.rs:486,497):
# ChineseMandarin has NO iso639-1 or NLLB code there, so selecting it for
# marian/mbart50/m2m100/nllb is the "Missing ... language" error path;
# only T5 (which renders the Display name — "Chinese Mandarin", with the
# space the reference Display impl inserts at uppercase boundaries,
# translation_pipeline.rs:250-270) accepts it.
LANGUAGES = {
    "en": ("English", "en", "eng_Latn"),
    "fr": ("French", "fr", "fra_Latn"),
    "de": ("German", "de", "deu_Latn"),
    "es": ("Spanish", "es", "spa_Latn"),
    "zh": ("Chinese Mandarin", None, None),
}


def get_prefix_and_forced_bos(
    model_type: str,
    source_lang: str | None,
    target_lang: str | None,
    supported_source: set[str],
    supported_target: set[str],
) -> tuple[str | None, str | None]:
    """Per-family source prefix + forced decoder-BOS token, mirroring
    ``get_prefix_and_forced_bos_id`` (common.rs:1570-1725):

    - marian: multi-target models take a ``>>xx<< `` TEXT prefix, no BOS;
    - t5: ``translate {Source} to {Target}:`` task prefix, no BOS;
    - mbart50: ``>>src<< `` prefix + forced BOS ``>>tgt<<``;
    - m2m100: ``>>src.<< `` prefix (2-letter codes carry the dot) +
      forced BOS ``>>tgt.<<``;
    - nllb: NLLB source code as prefix + forced BOS of the target code.
    Language validation errors mirror the reference's ValueError paths.
    """
    for lang, pool, side in (
        (source_lang, supported_source, "source"),
        (target_lang, supported_target, "target"),
    ):
        if lang is not None and lang not in pool:
            raise ValueError(
                f"{lang} not in list of supported {side} languages: {sorted(pool)}"
            )

    def need(lang: str | None, side: str) -> str:
        if lang is None:
            raise ValueError(f"Missing {side} language for {model_type}")
        return lang

    def code(lang: str | None, side: str, pos: int) -> str:
        """Family code for the language, or the reference's error path
        when the code is None (get_iso_639_1_code → ok_or_else)."""
        c = LANGUAGES[need(lang, side)][pos]
        if c is None:
            raise ValueError(f"Missing {side} language for {model_type}")
        return c

    if model_type == "marian":
        if len(supported_target) > 1:
            return f">>{code(target_lang, 'target', 1)}<< ", None
        return None, None
    if model_type == "t5":
        return (
            f"translate {LANGUAGES[need(source_lang, 'source')][0]} "
            f"to {LANGUAGES[need(target_lang, 'target')][0]}:",
            None,
        )
    if model_type == "mbart50":
        return (
            f">>{code(source_lang, 'source', 1)}<< ",
            f">>{code(target_lang, 'target', 1)}<<",
        )
    if model_type == "m2m100":
        # 2-letter iso codes carry a trailing dot in the token
        src = code(source_lang, "source", 1)
        tgt = code(target_lang, "target", 1)
        dot = lambda c: f">>{c}.<<" if len(c) == 2 else f">>{c}<<"  # noqa: E731
        return dot(src) + " ", dot(tgt)
    if model_type == "nllb":
        # bare code, NO trailing space — the reference prepends the NLLB
        # code directly (translation_pipeline.rs:1487-1494); the
        # whitespace separator our token model needs is added by the
        # stage, not here
        return (
            code(source_lang, "source", 2),
            code(target_lang, "target", 2),
        )
    raise ValueError(f"unknown translation model type {model_type!r}")


class TranslationStage(TextGenerationStage):
    """Translation across the reference's model families: Marian text
    prefix, T5 task prefix, and the MBart50/M2M100/NLLB forced-BOS path
    (translation_pipeline.rs:1479-1496 + common.rs:1570-1725).  The
    forced-BOS token is pinned as the first generated token, exactly as
    ``GenerateOptions { forced_bos_token_id }`` does in the reference."""

    SUPPORTED = set(LANGUAGES) - {"en"}

    def __init__(
        self,
        target_lang: str,
        source_lang: str = "en",
        model_type: str = "marian",
        opts: GenerateOptions | None = None,
    ):
        prefix, forced_bos = get_prefix_and_forced_bos(
            model_type,
            source_lang,
            target_lang,
            supported_source={"en"},
            supported_target=self.SUPPORTED,
        )
        opts = opts or GenerateOptions(max_length=12, num_beams=1)
        if forced_bos is not None:
            opts = GenerateOptions(**{**opts.__dict__, "forced_bos_token": forced_bos})
        super().__init__(opts)
        if forced_bos is not None:
            # the language token must be id-resolvable (convert_tokens_to_ids)
            lm = DeterministicLM()
            lm.vocab = lm.vocab[:-1] + [forced_bos, EOS]
            lm.eos_id = len(lm.vocab) - 1
            self.generator = Generator(lm)
        self.prefix = prefix or ""
        # The reference concatenates prefix+text directly and lets the
        # subword tokenizer split them; our whitespace token model needs
        # an explicit separator when the family's prefix (NLLB) carries
        # none.  Documented deviation — prefix STRING parity is in
        # get_prefix_and_forced_bos, the separator is token plumbing.
        self._sep = "" if (not self.prefix or self.prefix.endswith(" ")) else " "

    def _prompt(self, text: str) -> str:
        return self.prefix + self._sep + " ".join(text.split()[: self.prompt_words])


class LmScoreStage:
    """Per-document pseudo-perplexity scoring — the LM quality filter of
    a training-data pipeline (the CCNet / Gopher "perplexity against a
    reference LM" rule), run through the SAME KV-cache-shaped engine the
    generation stages use: one ``prefill`` then O(1) ``step``s, never a
    full-history re-read.

    Scoring rule (deterministic backend): at each position i ≥ 1 the
    candidate set is the LM's 16-word base vocab plus the actual next
    token; ``nll_i = logsumexp(candidates) − logit(actual)`` with the
    crc-driven bigram logit ``(crc(ctx|tok) % 1000) / 100`` (no EOS
    length pressure — scoring never terminates sequences).  Output is
    ``avg_nll = round_ha(Σ nll / n, 5)`` — lower = more "fluent" under
    the reference LM.  A real LM backend plugs in by replacing
    ``_base_logits`` / ``_tok_logit`` with its forward.

    Per-actor memo: base-vocab logit vectors keyed by the 2-token
    context (bounded cache), so repeated contexts cost one dict hit —
    the same bounded-memo pattern as the NER stage caches.
    """

    _MEMO_CAP = 200_000

    def __init__(self):
        self.lm = DeterministicLM()
        self.base_vocab = self.lm.vocab[:-1]  # no EOS in scoring
        self._memo: dict[tuple[str, ...], tuple[np.ndarray, float]] = {}

    def _ctx_key(self, state: LMState) -> tuple[str, ...]:
        return state.last2

    def _base(self, ctx: tuple[str, ...]) -> tuple[np.ndarray, float]:
        hit = self._memo.get(ctx)
        if hit is not None:
            return hit
        j = "\x00".join(ctx)
        logits = np.array(
            [(_crc(f"{j}|{t}") % 1000) / 100.0 for t in self.base_vocab],
            dtype=np.float64,
        )
        out = (logits, float(np.sum(np.exp(logits))))
        if len(self._memo) < self._MEMO_CAP:
            self._memo[ctx] = out
        return out

    def _score_tokens(self, tokens: list[str]) -> tuple[int, float]:
        state = self.lm.prefill(tokens[:1])
        nll_sum = 0.0
        for tok in tokens[1:]:
            ctx = self._ctx_key(state)
            _, s_base = self._base(ctx)
            a = (_crc("\x00".join(ctx) + f"|{tok}") % 1000) / 100.0
            nll_sum += float(np.log(s_base + np.exp(a)) - a)
            state = self.lm.step(state, tok)
        return len(tokens) - 1, nll_sum

    def __call__(self, batch):
        import pyarrow as pa

        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_n, out_nll = [], [], []
        from rust_bert_ray.functions.util import round_ha

        for doc_id, text in zip(ids, texts):
            tokens = text.split(" ")
            if len(tokens) < 2:
                continue
            n, s = self._score_tokens(tokens)
            out_id.append(doc_id)
            out_n.append(n)
            out_nll.append(float(round_ha(s / n, 5)))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_scored": pa.array(out_n, pa.int64()),
                "avg_nll": pa.array(out_nll, pa.float64()),
            }
        )
