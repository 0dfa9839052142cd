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


class DeterministicLM:
    """Hash-driven bigram-ish LM over a fixed vocab (the "model" backend)."""

    def __init__(self, vocab: list[str] | None = None):
        base = vocab if vocab is not None else [
            "data", "table", "row", "batch", "stream", "query", "join", "merge",
            "fast", "slow", "window", "sort", "hash", "scan", "group", "value",
        ]
        self.vocab = base + [EOS]
        self.eos_id = len(self.vocab) - 1

    def logits(self, tokens: list[str]) -> np.ndarray:
        """Next-token logits given the context (deterministic)."""
        ctx = "\x00".join(tokens[-2:])
        out = np.empty(len(self.vocab), dtype=np.float64)
        for i, tok in enumerate(self.vocab):
            out[i] = (_crc(f"{ctx}|{tok}") % 1000) / 100.0
        # EOS pressure grows with length so sequences terminate
        out[self.eos_id] += 0.02 * len(tokens)
        return out


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

    max_length: int = 20
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


@dataclass
class _Hyp:
    tokens: list[str]
    logp: float


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

    def _step_logits(self, tokens: list[str], opts: GenerateOptions) -> np.ndarray:
        logits = self.lm.logits(tokens)
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
        if opts.num_beams > 1:
            out = self._beam(prompt_tokens, opts)
        else:
            out = self._greedy_or_sample(prompt_tokens, opts)
        return " ".join(out)

    def _greedy_or_sample(self, prompt: list[str], opts: GenerateOptions) -> list[str]:
        rng = np.random.default_rng(opts.seed)
        tokens = list(prompt)
        for _ in range(opts.max_length):
            logits = self._step_logits(tokens, opts)
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
            tok = self.lm.vocab[idx]
            if tok == EOS:
                break
            tokens.append(tok)
        return tokens[len(prompt) :]

    def _beam(self, prompt: list[str], opts: GenerateOptions) -> list[str]:
        beams: list[_Hyp] = [_Hyp(list(prompt), 0.0)]
        done = BeamHypotheses(opts.num_beams, opts.length_penalty, opts.early_stopping)
        for _step in range(opts.max_length):
            candidates: list[_Hyp] = []
            for h in beams:
                logits = self._step_logits(h.tokens, opts)
                logp = logits - np.log(np.exp(logits - logits.max()).sum()) - logits.max()
                # top 2×beams successors per beam (reference keeps 2×beams)
                for idx in np.argsort(-logp)[: 2 * opts.num_beams]:
                    tok = self.lm.vocab[int(idx)]
                    nh = _Hyp(h.tokens + [tok], h.logp + float(logp[idx]))
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
        best = done.hyps[0][1]
        return best.tokens[len(prompt) :]


# ------------------------------------------------------------- task stages

GEN_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("generated", pa.string()), ("n_tokens", pa.int32())]
)


class TextGenerationStage:
    """documents → free generation continuing each doc's first words."""

    def __init__(self, opts: GenerateOptions | None = None, prompt_words: int = 4):
        self.generator = Generator()
        self.opts = opts or GenerateOptions(max_length=16, no_repeat_ngram_size=3)
        self.prompt_words = prompt_words

    def _prompt(self, text: str) -> str:
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


class TranslationStage(TextGenerationStage):
    """Marian-style ``>>xx<<`` target-language prefix with validation
    (translation_pipeline.rs:1479-1496)."""

    SUPPORTED = {"fr", "de", "es", "zh"}

    def __init__(self, target_lang: str, opts: GenerateOptions | None = None):
        if target_lang not in self.SUPPORTED:
            raise ValueError(
                f"unsupported target language {target_lang!r}; "
                f"supported: {sorted(self.SUPPORTED)}"
            )
        super().__init__(opts or GenerateOptions(max_length=12, num_beams=1))
        self.prefix = f">>{target_lang}<< "

    def _prompt(self, text: str) -> str:
        return self.prefix + " ".join(text.split()[: self.prompt_words])
