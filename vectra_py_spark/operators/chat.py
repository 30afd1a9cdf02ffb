"""Conversation (SFT / chat) data operators — the instruction-tuning
half of a training-data pipeline: parse multi-turn conversations out of
the JSON interchange shape every SFT corpus ships in (the OpenAI
``messages`` array of ``{role, content}`` objects; ShareGPT/OASST/Tulu
exports are the same shape modulo role spelling), validate the
structural contract trainers assume (optional leading system turn, then
strict user/assistant alternation ending on assistant, non-empty
contents, known roles), compute per-conversation stats, and dedup
conversations on their normalized assistant transcript — the SFT
hygiene op that catches the same responses arriving via different
scrapes. Reference tie-in: the reference indexes flat documents only
(``local_document_index.py`` has no turn structure); a user bringing
chat corpora needs the turn layer before any of its chunk/embed
machinery applies.

Design (Spark-first):

* Parsing is ``from_json`` with a fixed ``array<struct<role,content>>``
  schema — JVM-side, no Python in the hot path. Spark's ``from_json``
  silently wraps a bare JSON OBJECT into a one-element array when the
  schema is an array; that coercion would make the malformed/row
  quarantine engine-specific, so payloads that don't start with ``[``
  are rejected EXPLICITLY before the parse (deterministic contract,
  same answer in any engine).
* Validation is windows + aggregates on the turn frame — no
  ``collect_list`` of whole conversations, so a pathological
  million-turn conversation degrades to a wide group, not a driver
  OOM. Alternation is checked by PARITY against the core position
  (row_number over leading-system-stripped turns): position p must be
  ``user`` for even p, ``assistant`` for odd p — stronger than
  adjacent-inequality and expressible identically in SQL.
* Dedup fingerprints are ``md5`` of the whitespace-normalized
  assistant transcript in turn order (``sort_array`` of
  (turn_idx, content) structs — per-conversation arrays are
  message-bounded, not corpus-bounded), then one groupBy keyed on the
  digest; min-id survivor, the convention every dedup op in this repo
  uses.

Scale shape: parse + explode are narrow; validation is one shuffle on
the conversation key (window + groupBy share it); dedup is one shuffle
on the 16-byte digest. Payload contents shuffle once (for the
transcript concat) as digests thereafter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "TURN_SCHEMA",
    "ROLE_SYSTEM",
    "ROLE_USER",
    "ROLE_ASSISTANT",
    "parse_conversations",
    "parse_conversations_sql",
    "jsonl_conversations",
    "validate_conversations",
    "conversation_stats",
    "conversation_fingerprints",
    "dedup_conversations",
    "render_chat_text",
]

TURN_SCHEMA = "array<struct<role:string,content:string>>"
ROLE_SYSTEM = "system"
ROLE_USER = "user"
ROLE_ASSISTANT = "assistant"

_PARSE_ERROR = "not a JSON message array"


def _norm(col: Column) -> Column:
    """Whitespace-normalized lowercase content (dedup/identity key)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def parse_conversations(
    df: DataFrame,
    id_col: str = "conv_id",
    json_col: str = "messages",
) -> DataFrame:
    """(conv_id, turn_idx, role, content, kind) — one row per turn.

    ``kind``:

    * ``'turn'``  — a parsed element (role/content may be NULL when the
      element omits a key; validation flags that, parsing keeps it);
    * ``'empty'`` — a well-formed but zero-length array (surfaced so
      empty conversations are visible to validation, not dropped);
    * ``'error'`` — the payload is NULL, does not start with ``[``, or
      fails JSON parsing; ``content`` carries the exact message
      (the feeds.py quarantine contract).

    ``turn_idx`` is −1 for empty/error rows so the column stays
    non-null and orderable.

    A NULL array ELEMENT is a legal (null-role, null-content) turn —
    Spark's ``from_json`` keeps it — while any non-null non-object
    element nulls the whole parse, i.e. quarantines the conversation;
    the SQL twin reproduces both rules.

    Single pass: the three classifications build ONE per-row array
    (≥1 element by construction) and one explode — the source is
    scanned and JSON-parsed exactly once, not once per branch.
    """
    raw = F.col(json_col)
    parsed = F.from_json(raw, TURN_SCHEMA)
    # from_json wraps a bare object into [object] under an array schema;
    # refuse non-'['-leading payloads up front so the quarantine rule is
    # engine-portable (see module docstring)
    ok = raw.isNotNull() & F.ltrim(raw).startswith("[") & parsed.isNotNull()

    def one(role, content, kind: str):
        return F.array(
            F.struct(
                role.alias("role"), content.alias("content"),
                F.lit(kind).alias("kind"),
            )
        )

    null_s = F.lit(None).cast("string")
    rows = (
        F.when(
            ok & (F.size(parsed) > 0),
            F.transform(
                parsed,
                lambda t: F.struct(
                    t["role"].alias("role"),
                    t["content"].alias("content"),
                    F.lit("turn").alias("kind"),
                ),
            ),
        )
        .when(ok, one(null_s, null_s, "empty"))
        .otherwise(one(null_s, F.lit(_PARSE_ERROR), "error"))
    )
    return (
        df.select(
            F.col(id_col).alias("conv_id"),
            F.posexplode(rows).alias("_pos", "_t"),
        )
        .select(
            "conv_id",
            F.when(F.col("_t.kind") == "turn", F.col("_pos"))
            .otherwise(F.lit(-1)).cast("int").alias("turn_idx"),
            F.col("_t.role").alias("role"),
            F.col("_t.content").alias("content"),
            F.col("_t.kind").alias("kind"),
        )
    )


def parse_conversations_sql(
    table: str = "conversations",
    id_expr: str = "conv_id",
    json_expr: str = "messages",
) -> str:
    """DuckDB twin of :func:`parse_conversations` — same quarantine rule
    (leading-``[`` guard + parse validity + the non-object-element rule:
    a NULL element is a legal null turn, any other non-object element
    quarantines the whole conversation, matching Spark's ``from_json``),
    turns via a bounded range unnest over ``json_array_length``."""
    return f"""
        WITH base0 AS (
            SELECT {id_expr} AS conv_id, {json_expr} AS raw,
                   TRY_CAST({json_expr} AS JSON) AS j
            FROM {table}
        ),
        base AS (
            SELECT conv_id, raw, j,
                   (raw IS NOT NULL
                    AND starts_with(ltrim(raw), '[')
                    AND j IS NOT NULL
                    AND NOT EXISTS (
                        SELECT 1 FROM unnest(range(0,
                            CAST(json_array_length(j) AS BIGINT))) AS e(i)
                        WHERE json_type(json_extract(j, '$[' || i || ']'))
                              NOT IN ('OBJECT', 'NULL')
                    )) AS ok
            FROM base0
        ),
        turns AS (
            SELECT conv_id, CAST(i AS INTEGER) AS turn_idx,
                   json_extract_string(j, '$[' || i || '].role') AS role,
                   json_extract_string(j, '$[' || i || '].content')
                       AS content,
                   'turn' AS kind
            FROM (SELECT conv_id, j,
                         CAST(json_array_length(j) AS BIGINT) AS n
                  FROM base WHERE ok),
                 LATERAL unnest(range(0, n)) AS t(i)
        ),
        empties AS (
            SELECT conv_id, CAST(-1 AS INTEGER) AS turn_idx,
                   CAST(NULL AS VARCHAR) AS role,
                   CAST(NULL AS VARCHAR) AS content, 'empty' AS kind
            FROM base WHERE ok AND json_array_length(j) = 0
        ),
        errors AS (
            SELECT conv_id, CAST(-1 AS INTEGER) AS turn_idx,
                   CAST(NULL AS VARCHAR) AS role,
                   '{_PARSE_ERROR}' AS content, 'error' AS kind
            FROM base WHERE NOT ok
        )
        SELECT * FROM turns
        UNION ALL SELECT * FROM empties
        UNION ALL SELECT * FROM errors
    """


def jsonl_conversations(
    lines: DataFrame, value_col: str = "value"
) -> DataFrame:
    """(conv_id string, messages string) from raw JSONL lines — the
    ONE extraction both the batch CLI (`chat-curate`) and the streaming
    twin (`streaming/chat.py`) use, so a line classifies identically on
    either path.

    ``conv_id`` is ``$.conv_id`` AS A STRING — ShareGPT/OASST ids are
    strings (``"identity_0"``), numeric ids stringify losslessly. A
    line without one (or that isn't JSON) gets a synthetic
    ``_line_<xxhash64>`` id with the raw line as its payload, which
    `parse_conversations` then quarantines — malformed lines surface
    as kind='error' rows instead of vanishing."""
    v = F.col(value_col)
    cid = F.get_json_object(v, "$.conv_id")
    synth = F.concat(
        F.lit("_line_"), F.abs(F.xxhash64(v)).cast("string")
    )
    return lines.select(
        F.coalesce(cid, synth).alias("conv_id"),
        F.when(cid.isNotNull(), F.get_json_object(v, "$.messages"))
        .otherwise(v).alias("messages"),
    )


def validate_conversations(
    turns: DataFrame,
    system_role: str = ROLE_SYSTEM,
    user_role: str = ROLE_USER,
    assistant_role: str = ROLE_ASSISTANT,
) -> DataFrame:
    """Per-conversation contract check over :func:`parse_conversations`
    output: (conv_id, n_turns, has_error, is_empty, unknown_role,
    empty_content, bad_system_placement, bad_first_role,
    broken_alternation, dangling_user, valid).

    The contract (the OpenAI fine-tuning / Tulu shape): any number of
    LEADING system turns (>1 is unusual but placement, not count, is
    the structural error), then user/assistant strictly alternating
    from user, ending on assistant, every content non-blank, every
    role known.

    * ``bad_system_placement`` — a system turn after a non-system turn;
    * ``bad_first_role`` — first non-system ("core") turn isn't user;
    * ``broken_alternation`` — a core turn at position p ≥ 1 whose role
      isn't the parity-expected user/assistant;
    * ``dangling_user`` — the last core turn is user (unanswered);
    * ``valid`` — none of the flags, ≥1 turn, no parse error.
    """
    t = turns.where(F.col("kind") == "turn")
    first_ns = t.where(F.col("role") != system_role).groupBy("conv_id").agg(
        F.min("turn_idx").alias("_first_core_idx")
    )
    # core = leading-system-stripped turns, positioned by row_number
    core_w = Window.partitionBy("conv_id").orderBy("turn_idx")
    core = (
        t.join(first_ns, "conv_id", "left")
        .where(F.col("turn_idx") >= F.coalesce(F.col("_first_core_idx"),
                                               F.lit(2**31 - 1)))
        .withColumn("_p", F.row_number().over(core_w) - 1)
    )
    expected = F.when(F.col("_p") % 2 == 0, user_role).otherwise(
        assistant_role
    )
    core_flags = core.groupBy("conv_id").agg(
        F.max(
            (F.col("_p") == 0) & (F.col("role") != user_role)
        ).alias("bad_first_role"),
        F.max(
            (F.col("_p") >= 1)
            & (F.col("role").isNull() | (F.col("role") != expected))
        ).alias("broken_alternation"),
        F.max_by(F.col("role") == user_role, F.col("_p")).alias(
            "dangling_user"
        ),
        F.max(F.col("role") == system_role).alias("bad_system_placement"),
    )
    known = F.array(
        F.lit(system_role), F.lit(user_role), F.lit(assistant_role)
    )
    per_conv = turns.groupBy("conv_id").agg(
        F.sum((F.col("kind") == "turn").cast("int"))
        .cast("bigint").alias("n_turns"),
        F.max(F.col("kind") == "error").alias("has_error"),
        F.max(F.col("kind") == "empty").alias("is_empty"),
        F.max(
            (F.col("kind") == "turn")
            & (F.col("role").isNull()
               | ~F.array_contains(known, F.col("role")))
        ).alias("unknown_role"),
        F.max(
            (F.col("kind") == "turn")
            & (F.col("content").isNull() | (F.trim("content") == ""))
        ).alias("empty_content"),
    )
    # both sides are conversation-count-sized; a broadcast pick here is
    # a planner misestimate at corpus scale — pin the shuffle join
    out = per_conv.join(core_flags.hint("merge"), "conv_id", "left")
    # a conversation whose every turn is system has no core row at all
    # (the left join misses) — that is not a valid conversation either
    has_core = F.col("bad_first_role").isNotNull()
    fill = lambda c: F.coalesce(F.col(c), F.lit(False)).alias(c)  # noqa: E731
    flags = [
        "has_error", "is_empty", "unknown_role", "empty_content",
        "bad_system_placement", "bad_first_role", "broken_alternation",
        "dangling_user",
    ]
    out = out.select(
        "conv_id", "n_turns", has_core.alias("_has_core"),
        *[fill(c) for c in flags],
    )
    invalid = None
    for c in flags:
        invalid = F.col(c) if invalid is None else (invalid | F.col(c))
    return out.withColumn(
        "valid", (~invalid) & (F.col("n_turns") > 0) & F.col("_has_core")
    ).drop("_has_core")


def conversation_stats(
    turns: DataFrame,
    system_role: str = ROLE_SYSTEM,
    user_role: str = ROLE_USER,
    assistant_role: str = ROLE_ASSISTANT,
) -> DataFrame:
    """(conv_id, n_turns, n_system, n_user, n_assistant, user_words,
    assistant_words, assistant_chars) — the size/shape frame mixing and
    packing decisions read (length-bucketed batching over conversations
    keys on exactly these)."""
    t = turns.where(F.col("kind") == "turn")
    # trim BEFORE splitting: ' hi there' must be 2 words, not 3 (the
    # geneval _words convention)
    trimmed = F.trim(F.coalesce(F.col("content"), F.lit("")))
    n_words = F.when(trimmed == "", 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )

    def n_role(r: str):
        return F.sum((F.col("role") == r).cast("int")).cast("bigint")

    def words_of(r: str):
        return F.sum(
            F.when(F.col("role") == r, n_words).otherwise(0)
        ).cast("bigint")

    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        n_role(system_role).alias("n_system"),
        n_role(user_role).alias("n_user"),
        n_role(assistant_role).alias("n_assistant"),
        words_of(user_role).alias("user_words"),
        words_of(assistant_role).alias("assistant_words"),
        F.sum(
            F.when(
                F.col("role") == assistant_role,
                F.length(F.coalesce(F.col("content"), F.lit(""))),
            ).otherwise(0)
        ).cast("bigint").alias("assistant_chars"),
    )


def conversation_fingerprints(
    turns: DataFrame,
    role: str = ROLE_ASSISTANT,
) -> DataFrame:
    """(conv_id, fingerprint) — md5 of the normalized ``role``
    transcript in turn order, '\\n'-joined. Conversations with no such
    turns fingerprint the empty transcript (they dedup together —
    deliberately: all-user shells carry no trainable signal)."""
    t = turns.where((F.col("kind") == "turn") & (F.col("role") == role))
    per = t.groupBy("conv_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("turn_idx", "content"))
                ),
                lambda s: _norm(s["content"]),
            ),
        ).alias("_txt")
    )
    all_ids = turns.select("conv_id").distinct()
    return (
        all_ids.join(per, "conv_id", "left")
        .select(
            "conv_id",
            F.md5(F.coalesce(F.col("_txt"), F.lit(""))).alias("fingerprint"),
        )
    )


def render_chat_text(
    turns: DataFrame,
    role_open: str = "<|{role}|>\n",
    turn_close: str = "<|end|>\n",
    include_errors: bool = False,
) -> DataFrame:
    """(conv_id, text, n_turns) — flatten parsed turns into the single
    training string SFT tokenization consumes (the ChatML-style
    ``<|role|>\\ncontent<|end|>`` framing; both markers are
    templates — ``{role}`` interpolates — so Llama/Zephyr-style
    framings are a parameter away). The output feeds this repo's
    tokenizer → `operators/packing.py::pack_sequences` directly: the
    render → tokenize → pack chain is the standard SFT data path.

    Turn order is by ``turn_idx`` (``sort_array`` over message-bounded
    per-conversation structs, never a corpus-wide sort); error/empty
    rows are excluded unless ``include_errors`` (they have no text).
    One shuffle on the conversation key."""
    t = turns.where(
        F.col("kind") == "turn" if not include_errors
        else F.col("kind").isin("turn", "error")
    )
    per = t.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", "role", "content"))
        ).alias("_turns"),
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
    )
    # transform+concat_ws keeps the whole render JVM-side
    rendered = per.select(
        "conv_id",
        F.concat_ws(
            "",
            F.transform(
                F.col("_turns"),
                lambda s: F.concat(
                    F.replace(
                        F.lit(role_open), F.lit("{role}"),
                        F.coalesce(s["role"], F.lit("")),
                    ),
                    F.coalesce(s["content"], F.lit("")),
                    F.replace(
                        F.lit(turn_close), F.lit("{role}"),
                        F.coalesce(s["role"], F.lit("")),
                    ),
                ),
            ),
        ).alias("text"),
        "n_turns",
    )
    return rendered


def dedup_conversations(
    turns: DataFrame,
    role: str = ROLE_ASSISTANT,
) -> DataFrame:
    """(conv_id, fingerprint, canonical_id, is_canonical, n_copies) —
    exact dedup on :func:`conversation_fingerprints`; min-id survivor
    per group (the repo-wide canonical-survivor convention). One
    shuffle on the digest; a window over digest groups assigns the
    survivor without a second join."""
    fp = conversation_fingerprints(turns, role=role)
    w = Window.partitionBy("fingerprint")
    return fp.select(
        "conv_id",
        "fingerprint",
        F.min("conv_id").over(w).alias("canonical_id"),
        (F.col("conv_id") == F.min("conv_id").over(w)).alias("is_canonical"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_copies"),
    )
