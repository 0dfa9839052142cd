"""Conversation manager: incremental keyed state behind a Ray actor.

Mirrors ``ConversationManager`` / ``Conversation``
(/root/reference/src/pipelines/conversation.rs:192-200, 469-699,
925-934, 997-1064):

- conversations keyed by UUID; each holds ``past_user_inputs``,
  ``generated_responses``, an optional pending ``new_user_input`` and a
  token-id ``history``;
- ``generate_responses`` consumes every conversation with a pending
  input, appends prompt+response ids to history and marks it processed;
- history is truncated to ``max_allowed_context_length`` at an EOS
  boundary (conversation.rs:997-1064): cut at the earliest EOS such that
  the remainder fits.

This is the one reference component whose semantics genuinely need
mutable keyed state, so it is a Ray ACTOR (SURVEY.md §1.4) — one actor
per key-hash shard if fan-in ever matters; here a single named actor.
The decode backend is the deterministic Generator.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field

from rust_bert_ray.stages.generation import EOS, GenerateOptions, Generator


@dataclass
class Conversation:
    past_user_inputs: list[str] = field(default_factory=list)
    generated_responses: list[str] = field(default_factory=list)
    new_user_input: str | None = None
    history: list[str] = field(default_factory=list)  # token strings incl. EOS

    def add_user_input(self, text: str) -> None:
        if self.new_user_input is not None:
            raise ValueError("previous user input has not been processed yet")
        self.new_user_input = text

    def mark_processed(self, response: str) -> None:
        self.past_user_inputs.append(self.new_user_input or "")
        self.generated_responses.append(response)
        self.new_user_input = None


class ConversationManager:
    """Plain-Python manager; wrap with ``ray.remote`` for the actor form."""

    def __init__(
        self,
        max_allowed_context_length: int = 64,
        opts: GenerateOptions | None = None,
    ):
        self.conversations: dict[str, Conversation] = {}
        self.generator = Generator()
        self.opts = opts or GenerateOptions(max_length=8, no_repeat_ngram_size=3)
        self.max_ctx = max_allowed_context_length

    def create(self, first_input: str | None = None) -> str:
        cid = str(uuid.uuid4())
        conv = Conversation()
        if first_input is not None:
            conv.add_user_input(first_input)
        self.conversations[cid] = conv
        return cid

    def add_user_input(self, cid: str, text: str) -> None:
        self.conversations[cid].add_user_input(text)

    def get(self, cid: str) -> Conversation:
        return self.conversations[cid]

    def _truncate(self, history: list[str]) -> list[str]:
        """Truncate to max_ctx at an EOS boundary (conversation.rs:997-1064)."""
        if len(history) <= self.max_ctx:
            return history
        overflow = len(history) - self.max_ctx
        # earliest cut point at an EOS ≥ overflow
        for i, tok in enumerate(history):
            if tok == EOS and i + 1 >= overflow:
                return history[i + 1 :]
        return history[-self.max_ctx :]

    def generate_responses(self) -> dict[str, str]:
        """Respond to every conversation with a pending input."""
        out: dict[str, str] = {}
        for cid, conv in self.conversations.items():
            if conv.new_user_input is None:
                continue
            prompt_tokens = conv.history + conv.new_user_input.split() + [EOS]
            response = self.generator.generate(
                " ".join(t for t in prompt_tokens if t != EOS), self.opts
            )
            conv.history = self._truncate(
                prompt_tokens + response.split() + [EOS]
            )
            conv.mark_processed(response)
            out[cid] = response
        return out


def conversation_actor(**kwargs):
    """Create a named Ray actor wrapping ConversationManager."""
    import ray

    cls = ray.remote(ConversationManager)
    return cls.options(name="conversation_manager", get_if_exists=True).remote(**kwargs)


class ConversationStage:
    """documents → multi-turn conversation transcript rows.

    Batched conversational decode: each batch hosts one
    ``ConversationManager``; every doc opens a conversation, turn t's
    user input is the doc's t-th word window, and ONE
    ``generate_responses()`` call per turn answers every pending
    conversation (the reference's batch semantics,
    conversation.rs:925-934).  Conversations are independent, so output
    rows are per-doc deterministic regardless of batch composition.
    """

    def __init__(self, turns: int = 2, words_per_turn: int = 3):
        self.turns = turns
        self.words_per_turn = words_per_turn

    def __call__(self, batch):
        import pyarrow as pa

        mgr = ConversationManager()
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        cids = [mgr.create() for _ in doc_ids]
        out = {"doc_id": [], "turn": [], "user_input": [], "response": []}
        wpt = self.words_per_turn
        for t in range(self.turns):
            inputs = []
            for cid, text in zip(cids, texts):
                words = text.split()
                seg = " ".join(words[t * wpt : (t + 1) * wpt]) or "pad"
                mgr.add_user_input(cid, seg)
                inputs.append(seg)
            responses = mgr.generate_responses()
            for doc_id, cid, seg in zip(doc_ids, cids, inputs):
                out["doc_id"].append(doc_id)
                out["turn"].append(t)
                out["user_input"].append(seg)
                out["response"].append(responses[cid])
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "turn": pa.array(out["turn"], type=pa.int64()),
                "user_input": pa.array(out["user_input"], type=pa.string()),
                "response": pa.array(out["response"], type=pa.string()),
            }
        )
