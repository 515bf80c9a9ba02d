"""Training-example construction over transcripts: SFT context packing
and response-extractiveness scoring.

Both operators consume the north-rule transcript shape
``(conv_id, turn_idx, role, text, ...)`` and run under the SAME
conversation partitioning the extraction pipeline already shuffles on —
composing them after extraction adds zero Exchanges.

Reference analog: the reference assembles page-ordered document payloads
for review (``DocumentAggregatorService.cs:26-76``); here the same
ordered-window machinery assembles turn-ordered *training context* —
the supervised-fine-tuning example shape (context turns → assistant
target) every post-training pipeline emits.

Scale notes (10¹² turns):
* ``sft_pack_examples`` — one window under partitionBy(conv_id); the
  context frame is BOUNDED (``context_turns`` preceding rows), so state
  per row is O(k·turn_len) regardless of conversation length — the same
  bounded-buffer argument as the consolidation fold's long-conversation
  guard.
* ``extractiveness`` — one ``lag`` window + map-only array arithmetic;
  the token sets live per-row, never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .textstats import TOKEN_SPLIT

#: NULL-text rule shared by every operator here AND its oracle: a NULL
#: turn text is treated as the EMPTY STRING. Without this, Spark and SQL
#: engines disagree on NULL ordering inside struct min/max (Spark structs
#: sort NULL fields first; DuckDB ORDER BY defaults NULLS LAST) and on
#: NULL propagation through concat — the round-4 review reproduced a
#: preference_pairs rejected-turn flip on a NULL-text turn.
_TEXT = lambda: F.coalesce(F.col("text"), F.lit(""))

__all__ = ["sft_pack_examples", "extractiveness", "best_of_n",
           "preference_pairs", "context_window_fit", "conv_windows",
           "truncation_audit", "chat_spans", "chat_render_report",
           "tool_call_lint", "merge_same_role_turns",
           "system_prompt_profile", "timestamp_lint"]


def sft_pack_examples(
    t: DataFrame, context_turns: int = 3, target_role: str = "assistant"
) -> DataFrame:
    """Pack each ``target_role`` turn into a supervised training example:
    the previous ``context_turns`` turns rendered as ``role: text`` lines
    become the context, the turn's own text the target.

    One bounded-frame window (ROWS BETWEEN k PRECEDING AND 1 PRECEDING)
    ordered by ``turn_idx`` — the frame order makes the collected list
    deterministic, and the bound keeps per-row state O(k) however long
    the conversation runs.

    Returns ``(conv_id, turn_idx, n_context_turns, context_chars,
    target_chars, context_text)``.
    """
    w = (
        W.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-context_turns, -1)
    )
    line = F.concat_ws(": ", F.col("role"), _TEXT())
    ctx = F.concat_ws("\n", F.collect_list(line).over(w))
    n_ctx = F.count(F.lit(1)).over(w).cast("long")
    return (
        t.select(
            "conv_id",
            "turn_idx",
            "role",
            "text",
            n_ctx.alias("n_context_turns"),
            ctx.alias("context_text"),
        )
        .filter((F.col("role") == target_role) & (F.col("n_context_turns") > 0))
        .select(
            "conv_id",
            "turn_idx",
            "n_context_turns",
            F.length("context_text").cast("long").alias("context_chars"),
            F.length(_TEXT()).cast("long").alias("target_chars"),
            "context_text",
        )
    )


def extractiveness(t: DataFrame, target_role: str = "assistant") -> DataFrame:
    """Response copy-ratio: what fraction of a ``target_role`` turn's
    distinct tokens already appear in the immediately preceding turn —
    high values flag extractive/echo responses a curation pass
    down-weights (the abstractive-vs-extractive axis of summarization
    quality, cf. Grusky et al. NEWSROOM 1804.11283's coverage metric).

    One ``lag`` window carries the previous turn's text; token sets are
    per-row ``array_distinct`` over a shared dialect-neutral split, the
    overlap a map-only ``array_intersect``. Counts are BIGINT; the ratio
    is ONE division of exact integers (IEEE-identical cross-engine).

    Returns ``(conv_id, turn_idx, n_tokens, n_shared, copy_ratio)`` for
    ``target_role`` turns that have a preceding turn.
    """
    toks = lambda c: F.array_remove(
        F.array_distinct(F.split(F.lower(c), TOKEN_SPLIT)), ""
    )
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    cur = t.select(
        "conv_id",
        "turn_idx",
        "role",
        toks(_TEXT()).alias("cur_toks"),
        F.lag(F.col("text")).over(w).alias("prev_text"),
    )
    return (
        cur.filter(
            (F.col("role") == target_role) & F.col("prev_text").isNotNull()
        )
        .select(
            "conv_id",
            "turn_idx",
            F.size("cur_toks").cast("long").alias("n_tokens"),
            F.size(
                F.array_intersect("cur_toks", toks(F.col("prev_text")))
            ).cast("long").alias("n_shared"),
        )
        .withColumn(
            "copy_ratio",
            F.when(
                F.col("n_tokens") > 0,
                F.col("n_shared").cast("double") / F.col("n_tokens"),
            ),
        )
    )


def best_of_n(t: DataFrame, target_role: str = "assistant") -> DataFrame:
    """Best-of-n selection: per conversation, pick the single
    ``target_role`` turn that maximizes a deterministic reward proxy —
    the rejection-sampling shape every RLHF-ish pipeline runs over
    sampled candidates (best-of-n / rejection sampling, Stiennon et al.
    2009.01325 §3; here the candidates are the conversation's own
    assistant turns and the reward is lexicographic
    (distinct-token count, char length, earliest turn)).

    NO window: the winner is one ``max(struct(reward…, payload…))``
    aggregate — map-side combinable, so a million-turn conversation
    partially reduces inside every scan task before the single shuffle
    on conv_id. The reward keys precede the payload fields in the struct
    and ``turn_idx`` is unique per conversation, so comparison never
    reaches the payload.

    Returns ``(conv_id, n_candidates, turn_idx, reward_tokens,
    target_chars)``.
    """
    toks = F.array_remove(
        F.array_distinct(F.split(F.lower(_TEXT()), TOKEN_SPLIT)), ""
    )
    cand = t.filter(F.col("role") == target_role).select(
        "conv_id",
        F.size(toks).cast("long").alias("_r_tok"),
        F.length(_TEXT()).cast("long").alias("_r_chars"),
        (-F.col("turn_idx")).cast("long").alias("_r_turn"),
        F.col("turn_idx").cast("int").alias("_turn_idx"),
    )
    best = F.max(
        F.struct("_r_tok", "_r_chars", "_r_turn", "_turn_idx")
    ).alias("_best")
    return (
        cand.groupBy("conv_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_candidates"), best)
        .select(
            "conv_id",
            "n_candidates",
            F.col("_best._turn_idx").alias("turn_idx"),
            F.col("_best._r_tok").alias("reward_tokens"),
            F.col("_best._r_chars").alias("target_chars"),
        )
    )


def preference_pairs(
    t: DataFrame, target_role: str = "assistant"
) -> DataFrame:
    """Preference-pair construction: per conversation, the (chosen,
    rejected) pair of ``target_role`` turns under the deterministic
    reward proxy — the RLHF/DPO training-pair shape (Rafailov et al.
    2305.18290 consume exactly this (prompt, chosen, rejected) layout).
    Chosen = the :func:`best_of_n` winner; rejected = the lexicographic
    minimum (ties to the LATEST turn, mirroring the winner's
    earliest-turn rule). Conversations with fewer than two candidate
    turns emit nothing — a pair needs two distinct members, guaranteed
    because ``turn_idx`` is unique per conversation.

    Same scale shape as ``best_of_n``: ONE groupBy with max(struct) AND
    min(struct) — both map-side combinable, no window, one shuffle.

    Returns ``(conv_id, n_candidates, chosen_turn, rejected_turn,
    chosen_tokens, rejected_tokens, reward_gap_tokens)``.
    """
    toks = F.array_remove(
        F.array_distinct(F.split(F.lower(_TEXT()), TOKEN_SPLIT)), ""
    )
    cand = t.filter(F.col("role") == target_role).select(
        "conv_id",
        F.size(toks).cast("long").alias("_r_tok"),
        F.length(_TEXT()).cast("long").alias("_r_chars"),
        (-F.col("turn_idx")).cast("long").alias("_r_turn"),
        F.col("turn_idx").cast("int").alias("_turn_idx"),
    )
    key = F.struct("_r_tok", "_r_chars", "_r_turn", "_turn_idx")
    return (
        cand.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.max(key).alias("_hi"),
            F.min(key).alias("_lo"),
        )
        .filter(F.col("n_candidates") >= 2)
        .select(
            "conv_id",
            "n_candidates",
            F.col("_hi._turn_idx").alias("chosen_turn"),
            F.col("_lo._turn_idx").alias("rejected_turn"),
            F.col("_hi._r_tok").alias("chosen_tokens"),
            F.col("_lo._r_tok").alias("rejected_tokens"),
            (F.col("_hi._r_tok") - F.col("_lo._r_tok")).alias(
                "reward_gap_tokens"
            ),
        )
    )


def context_window_fit(t: DataFrame, budget_tokens: int = 256) -> DataFrame:
    """Context-budget truncation: keep the SUFFIX of each conversation
    whose cumulative whitespace-token count fits ``budget_tokens`` —
    drop-earliest-turns-first, the standard way a post-training pipeline
    fits a long conversation into a model's context window (latest turns
    carry the target; earliest context is the cheapest to lose).

    One window under the conversation partitioning: a running token sum
    ordered ``turn_idx`` DESCENDING, then a filter — a turn is kept iff
    ``cum ≤ budget``, i.e. the whole suffix starting at it fits. The rule
    is strict: a final turn that alone exceeds the budget drops its
    conversation entirely (the caller sizes the budget; the oracle pins
    the same rule).

    Returns kept turns: ``(conv_id, turn_idx, n_tokens,
    cum_tokens_from_end)``.
    """
    n_tok = F.size(
        F.filter(F.split(_TEXT(), " "), lambda x: x != "")
    ).cast("long")
    w = (
        W.partitionBy("conv_id")
        .orderBy(F.desc("turn_idx"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        t.select(
            "conv_id",
            "turn_idx",
            n_tok.alias("n_tokens"),
        )
        .withColumn(
            "cum_tokens_from_end", F.sum("n_tokens").over(w).cast("long")
        )
        .filter(F.col("cum_tokens_from_end") <= budget_tokens)
    )


def pair_length_bias(
    t: DataFrame, target_role: str = "assistant"
) -> DataFrame:
    """Length-bias audit over the :func:`preference_pairs` construction.

    RLHF reward signals are notoriously length-confounded: if "chosen"
    responses are systematically LONGER than "rejected" ones, a policy
    trained on the pairs learns verbosity, not quality (Singhal et al.,
    arXiv:2310.03716). The repo's reward proxy ranks by DISTINCT-token
    diversity, not raw length — so the audit question is how often the
    diversity winner is also the character-length winner, broken down by
    reward-gap band (a small gap with high length correlation is the
    dangerous regime: the reward barely separates the pair, length
    does).

    Same pair construction as :func:`preference_pairs` (one groupBy,
    max(struct)/min(struct), map-side combinable) with the char lengths
    carried through the structs, then ONE bounded rollup over the three
    gap bands. Two shuffles total; the second moves ≤3 rows per
    partition.

    Returns one row per band ``('0' | '1-2' | '3+')``:
    ``(gap_band, n_pairs, n_chosen_longer, n_len_ties,
    chosen_longer_ppm, avg_chosen_chars, avg_rejected_chars)`` —
    all ratios exact ppm integers, averages integral divisions.
    """
    toks = F.array_remove(
        F.array_distinct(F.split(F.lower(_TEXT()), TOKEN_SPLIT)), ""
    )
    cand = t.filter(F.col("role") == target_role).select(
        "conv_id",
        F.size(toks).cast("long").alias("_r_tok"),
        F.length(_TEXT()).cast("long").alias("_r_chars"),
        (-F.col("turn_idx")).cast("long").alias("_r_turn"),
        F.col("turn_idx").cast("int").alias("_turn_idx"),
    )
    key = F.struct("_r_tok", "_r_chars", "_r_turn", "_turn_idx")
    pairs = (
        cand.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.max(key).alias("_hi"),
            F.min(key).alias("_lo"),
        )
        .filter(F.col("n_candidates") >= 2)
        .select(
            (F.col("_hi._r_tok") - F.col("_lo._r_tok")).alias("_gap"),
            F.col("_hi._r_chars").alias("_hc"),
            F.col("_lo._r_chars").alias("_lc"),
        )
    )
    band = (
        F.when(F.col("_gap") == 0, "0")
        .when(F.col("_gap") <= 2, "1-2")
        .otherwise("3+")
    )
    return (
        pairs.groupBy(band.alias("gap_band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum((F.col("_hc") > F.col("_lc")).cast("int"))
            .cast("long")
            .alias("n_chosen_longer"),
            F.sum((F.col("_hc") == F.col("_lc")).cast("int"))
            .cast("long")
            .alias("n_len_ties"),
            F.sum("_hc").cast("long").alias("_sum_hc"),
            F.sum("_lc").cast("long").alias("_sum_lc"),
        )
        .select(
            "gap_band",
            "n_pairs",
            "n_chosen_longer",
            "n_len_ties",
            F.expr("n_chosen_longer * 1000000 div n_pairs").alias(
                "chosen_longer_ppm"
            ),
            F.expr("_sum_hc div n_pairs").alias("avg_chosen_chars"),
            F.expr("_sum_lc div n_pairs").alias("avg_rejected_chars"),
        )
    )


def conv_windows(
    t: DataFrame,
    window_tokens: int = 48,
    stride_tokens: int = 32,
) -> DataFrame:
    """Turn-aligned sliding training windows over long conversations:
    every ``window_tokens``-token context window (advancing by
    ``stride_tokens``) and the whole turns that fit it.

    The long-transcript complement of :func:`context_window_fit` (which
    keeps ONE suffix): training on a 10⁶-token agent transcript wants
    EVERY window, turn-aligned — a turn is never split (splitting a turn
    mid-token-stream breaks the role/loss-mask boundary), so a turn
    belongs to window ``w`` iff its token interval
    ``[cum_start, cum_start + n)`` fits inside
    ``[w·stride, w·stride + window)``. A single turn longer than the
    window fits no window and is dropped (the caller routes those
    through :func:`~..textstats.chunk_text`-style intra-turn splitting);
    with ``stride < window`` adjacent windows overlap — the standard
    long-context curriculum shape.

    All arithmetic stays non-negative so Spark ``div`` (truncates
    toward zero) and DuckDB ``//`` (floors) agree: the first candidate
    window is ``0`` when the turn fits from the origin, else
    ``(cum_start + n - window + stride - 1) div stride``; the last is
    ``cum_start div stride``.

    One shuffle: the cumulative-token window hash-partitions on
    ``conv_id`` and the per-(conv, window) rollup reuses that
    partitioning. The window-index explode is map-side and bounded by
    ``window/stride`` copies per turn.

    Returns ``(conv_id, win_idx, first_turn, last_turn, n_turns,
    n_tokens)``.
    """
    n_tok = F.size(
        F.filter(F.split(_TEXT(), " "), lambda x: x != "")
    ).cast("long")
    w = (
        W.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    base = t.select(
        "conv_id", "turn_idx", n_tok.alias("_n")
    ).withColumn(
        "_c0", F.coalesce(F.sum("_n").over(w), F.lit(0)).cast("long")
    )
    wmin = F.expr(
        f"CASE WHEN _c0 + _n <= {window_tokens} THEN CAST(0 AS BIGINT)"
        f" ELSE (_c0 + _n - {window_tokens} + {stride_tokens} - 1)"
        f" div {stride_tokens} END"
    )
    wmax = F.expr(f"_c0 div {stride_tokens}")
    exploded = (
        base.withColumn("_wmin", wmin)
        .withColumn("_wmax", wmax)
        .filter(F.col("_wmin") <= F.col("_wmax"))
        .select(
            "conv_id",
            "turn_idx",
            "_n",
            F.explode(F.expr("sequence(_wmin, _wmax)")).alias("win_idx"),
        )
    )
    return exploded.groupBy("conv_id", "win_idx").agg(
        F.min("turn_idx").alias("first_turn"),
        F.max("turn_idx").alias("last_turn"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("_n").alias("n_tokens"),
    )


def truncation_audit(
    t: DataFrame,
    budget_tokens: int = 64,
) -> DataFrame:
    """Context-budget truncation policy audit over long conversations:
    for a ``budget_tokens`` context window, compare the three standard
    turn-aligned truncation policies —

    * ``head``  — keep leading turns while they fit,
    * ``tail``  — keep trailing turns while they fit (the chat default:
      recent context survives),
    * ``edges`` — split the budget between the opening turns (system
      prompt, task statement) and the trailing turns, dropping the
      middle (the "drop-middle" long-context recipe) —

    reporting per policy what survives: turns, tokens, assistant tokens
    (the trainable lane), exact retention ppm, and how many
    conversations fit entirely. Turn-aligned like :func:`conv_windows`:
    a turn is kept whole or not at all.

    Shape: one forward and one backward cumulative-token window under
    the same conversation partitioning (ONE shuffle), a per-conversation
    conditional-sum rollup that reuses it, then a 3-row literal unpivot
    over a bounded per-conv aggregate.

    Returns ``(policy, n_convs, convs_fit, n_turns_kept, n_tokens_kept,
    asst_tokens_kept, tokens_kept_ppm)``.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    b = int(budget_tokens)
    b_head, b_tail = b // 2, b - b // 2
    n_tok = F.size(
        F.filter(F.split(_TEXT(), " "), lambda x: x != "")
    ).cast("long")
    wf = (
        W.partitionBy("conv_id").orderBy("turn_idx")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wb = (
        W.partitionBy("conv_id").orderBy("turn_idx")
        .rowsBetween(0, W.unboundedFollowing)
    )
    base = t.select(
        "conv_id",
        "turn_idx",
        n_tok.alias("_n"),
        (F.col("role") == "assistant").alias("_asst"),
    ).select(
        "conv_id", "_n", "_asst",
        F.sum("_n").over(wf).alias("_cf"),
        F.sum("_n").over(wb).alias("_cb"),
    )
    keep = {
        "head": F.col("_cf") <= b,
        "tail": F.col("_cb") <= b,
        "edges": (F.col("_cf") <= b_head) | (F.col("_cb") <= b_tail),
    }
    aggs = [F.sum("_n").alias("_tot")]
    for p, cond in keep.items():
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"_turns_{p}"),
            F.sum(F.when(cond, F.col("_n")).otherwise(0)).alias(f"_tok_{p}"),
            F.sum(
                F.when(cond & F.col("_asst"), F.col("_n")).otherwise(0)
            ).alias(f"_atok_{p}"),
        ]
    per_conv = base.groupBy("conv_id").agg(*aggs)
    rows = ", ".join(
        f"'{p}', _turns_{p}, _tok_{p}, _atok_{p}" for p in keep
    )
    unpivoted = per_conv.select(
        "_tot",
        F.expr(
            f"stack({len(keep)}, {rows})"
            " AS (policy, _turns, _tok, _atok)"
        ),
    )
    return (
        unpivoted.groupBy("policy")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_convs"),
            F.sum(F.when(F.col("_tok") == F.col("_tot"), 1).otherwise(0))
            .cast("long")
            .alias("convs_fit"),
            F.sum("_turns").cast("long").alias("n_turns_kept"),
            F.sum("_tok").cast("long").alias("n_tokens_kept"),
            F.sum("_atok").cast("long").alias("asst_tokens_kept"),
            F.sum("_tot").alias("_sum_tot"),
        )
        .select(
            "policy", "n_convs", "convs_fit", "n_turns_kept",
            "n_tokens_kept", "asst_tokens_kept",
            F.expr(
                "CAST(CAST(n_tokens_kept AS DECIMAL(38,0)) * 1000000"
                " div greatest(_sum_tot, 1) AS BIGINT)"
            ).alias("tokens_kept_ppm"),
        )
    )


def chat_spans(
    t: DataFrame,
    train_role: str = "assistant",
) -> DataFrame:
    """Loss-mask span table for chat-template serialization: for every
    turn, the character interval its text occupies inside the rendered
    conversation string — WITHOUT materializing that string.

    The render convention is fixed and trivially re-executable by any
    writer: each turn serializes as ``'<|' role '|>' \\n text \\n``, so
    a turn's block length is ``len(role) + 6 + len(text)`` and its text
    starts ``len(role) + 5`` chars into the block. One exclusive
    cumulative-length window under the conversation partitioning gives
    every offset; the trainable flag marks ``train_role`` turns (the
    spans a loss mask keeps). The writer that later materializes
    shard files re-derives byte offsets from these char offsets plus
    its own encoding — the span table IS the deliverable (materializing
    a 10⁶-turn conversation's string inside the plan would put the
    whole conversation in one task's row).

    Map-only except the ONE conversation-partitioned window. Returns
    ``(conv_id, turn_idx, role, trainable, text_start, text_end,
    block_end)`` with ``text_end - text_start = length(text)`` and
    consecutive blocks abutting exactly.
    """
    hdr_len = F.length("role") + F.lit(5)  # '<|' + role + '|>' + '\n'
    blk_len = hdr_len + F.length(_TEXT()) + F.lit(1)  # trailing '\n'
    w = (
        W.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    base = t.select(
        "conv_id",
        "turn_idx",
        "role",
        (F.col("role") == train_role).alias("trainable"),
        hdr_len.cast("long").alias("_hdr"),
        F.length(_TEXT()).cast("long").alias("_len"),
        blk_len.cast("long").alias("_blk"),
    ).withColumn(
        "_before", F.coalesce(F.sum("_blk").over(w), F.lit(0)).cast("long")
    )
    return base.select(
        "conv_id",
        "turn_idx",
        "role",
        "trainable",
        (F.col("_before") + F.col("_hdr")).alias("text_start"),
        (F.col("_before") + F.col("_hdr") + F.col("_len")).alias("text_end"),
        (F.col("_before") + F.col("_blk")).alias("block_end"),
    )


def tool_call_lint(
    calls: DataFrame,
    tool_col: str = "tool",
    args_col: str = "args",
    required: tuple[str, ...] = ("query", "k"),
) -> DataFrame:
    """Agent tool-call schema validation: parse each call's JSON
    argument payload and report, per tool, how many calls are
    malformed JSON and how many parse but omit a required argument —
    the admission gate agent transcripts pass before tool-use
    fine-tuning (a malformed argument string teaches the model to emit
    malformed calls).

    Parsing is Spark's JVM-side ``get_json_object``: path ``$`` is
    NULL iff the payload is not valid JSON (that defines
    ``malformed``); a required key is missing iff the doc parses but
    ``$.key`` is NULL. Contract: a required key explicitly set to JSON
    null counts as missing — both states are invisible to a downstream
    consumer reading the key. No Python touches a row.

    Shape: map-only checks, then ONE groupBy on the (bounded) tool
    name. Returns per tool: ``(tool, n_calls, n_malformed, n_missing,
    ok_ppm)``, ``ok_ppm`` exact via DECIMAL widening.
    """
    if not required:
        raise ValueError("required must name at least one argument key")
    parsed = F.get_json_object(F.col(args_col), "$")
    missing_any = None
    for key in required:
        miss = F.get_json_object(F.col(args_col), f"$.{key}").isNull()
        missing_any = miss if missing_any is None else (missing_any | miss)
    flagged = calls.select(
        F.col(tool_col),
        parsed.isNull().alias("_malformed"),
        (parsed.isNotNull() & missing_any).alias("_missing"),
    )
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return (
        flagged.groupBy(tool_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_calls"),
            one_if(F.col("_malformed")).alias("n_malformed"),
            one_if(F.col("_missing")).alias("n_missing"),
        )
        .withColumn(
            "ok_ppm",
            F.expr(
                "CAST(CAST(n_calls - n_malformed - n_missing"
                " AS DECIMAL(38,0)) * 1000000 div n_calls AS BIGINT)"
            ),
        )
    )


def chat_render_report(spans: DataFrame) -> DataFrame:
    """Per-conversation rollup of a :func:`chat_spans` table: rendered
    length, loss-mask (assistant-span) accounting, and an
    order-insensitive span fingerprint (``Σ(start·10⁶+3 + end) mod
    10⁹+7``, both offsets reduced before the fold so ANSI mode cannot
    overflow). ONE definition shared by the oracle-checked query and
    the scale bench so the measured plan is the validated plan."""
    fp = (
        "pmod(pmod(text_start, 1000000007) * 1000003"
        " + pmod(text_end, 1000000007), 1000000007)"
    )
    return spans.groupBy("conv_id").agg(
        F.max("block_end").cast("long").alias("rendered_chars"),
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.when(F.col("trainable"), 1).otherwise(0))
        .cast("long").alias("n_trainable"),
        F.sum(
            F.when(
                F.col("trainable"),
                F.col("text_end") - F.col("text_start"),
            ).otherwise(0)
        ).cast("long").alias("trainable_chars"),
        F.expr(
            f"CAST(sum(CAST({fp} AS DECIMAL(38,0)))"
            " % 1000000007 AS BIGINT)"
        ).alias("spans_fp"),
    )


def merge_same_role_turns(
    t: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Normalize consecutive same-role turns into one turn — the
    standard transcript repair before chat templating (a template
    renders each turn with a role header, so an unmerged same-role run
    teaches the model that a speaker re-announces itself mid-message).

    Gaps-and-islands under the conversation partitioning: a lag flags
    role changes, a cumulative sum numbers the islands (that number IS
    the re-index), and the island fold runs as a WINDOW over
    (conv, island) ordered by ``turn_col`` — the full-frame
    ``collect_list`` respects the window order (turn order by
    construction) and WindowExec streams over the sorted input
    buffering only ONE island at a time, where a
    ``groupBy().agg(collect_list(...))`` fold buffers
    partition-cardinality object state (measured 159 s vs 17 s at
    18.8M rows — the object-hash aggregate's sort-based fallback plus
    per-group object arrays are the whole difference). One row per
    island survives via ``row_number() = 1`` on the same window spec.
    The corpus still shuffles ONCE (both windows share the
    conversation hash partitioning; the island window adds an
    in-partition re-sort of an already-ordered stream, which the
    measurement shows is cheap).

    Returns ``(conv, new_turn_idx, role, text, n_merged, first_turn,
    last_turn)`` — one row per island, ``new_turn_idx`` dense from 1.
    """
    w = W.partitionBy(conv_col).orderBy(turn_col)
    change = F.when(
        F.lag(role_col).over(w).isNull()
        | (F.lag(role_col).over(w) != F.col(role_col)),
        1,
    ).otherwise(0)
    island = F.sum(change).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = t.select(
        F.col(conv_col),
        F.col(turn_col),
        F.col(role_col),
        F.col(text_col),
        island.alias("_island"),
    )
    wi = W.partitionBy(conv_col, "_island").orderBy(turn_col)
    full = wi.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        flagged.select(
            F.col(conv_col),
            F.col("_island").cast("long").alias("new_turn_idx"),
            F.col(role_col),
            F.concat_ws(sep, F.collect_list(text_col).over(full))
            .alias(text_col),
            F.count(F.lit(1)).over(full).cast("long").alias("n_merged"),
            F.min(turn_col).over(full).alias("first_turn"),
            F.max(turn_col).over(full).alias("last_turn"),
            F.row_number().over(wi).alias("_rn"),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def system_prompt_profile(
    t: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Census of distinct system-prompt texts: how many turns and how
    many conversations each exact prompt appears in, and its ppm share
    of all system turns — the dedup-exposure profile of the most
    boilerplate-heavy role (one canned system prompt repeated across
    10⁶ conversations dominates naive token counts and leaks across
    train/eval splits).

    Two-level aggregation instead of ``count(DISTINCT conv)``: the
    (text, conv) fold collapses the corpus first, then the text rollup
    runs over the already-collapsed table — same shape as
    :func:`~poc_document_ocr_spark.operators.textstats.pii_spread`.

    Returns ``(text, n_turns, n_convs, share_ppm)`` over rows with
    ``role = 'system'``.
    """
    sys_turns = t.filter(F.col(role_col) == "system")
    per_conv = sys_turns.groupBy(text_col, conv_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    per_text = per_conv.groupBy(text_col).agg(
        F.sum("_n").cast("long").alias("n_turns"),
        F.count(F.lit(1)).cast("long").alias("n_convs"),
    )
    total = per_text.agg(
        F.sum("n_turns").cast("long").alias("_tot")
    )
    return per_text.crossJoin(F.broadcast(total)).select(
        text_col,
        "n_turns",
        "n_convs",
        F.expr(
            "CAST(CAST(n_turns AS DECIMAL(38,0)) * 1000000"
            " div greatest(_tot, 1) AS BIGINT)"
        ).alias("share_ppm"),
    )


def timestamp_lint(
    t: DataFrame,
    epoch_col: str = "epoch",
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """Timestamp-integrity lint per conversation: ordering violations and
    inter-turn gap bounds.

    A transcript corpus's ``ts`` column is load-bearing (sessionization,
    temporal splits, latency profiles all key off it), so ingest must
    quantify clock damage before those operators run: turns whose
    timestamp is not strictly after the previous turn's
    (``n_nonmonotonic``), the strictly-backward subset (``n_backward``),
    and the min/max inter-turn gap in seconds. Complements
    ``turn_lint`` (structural integrity) — same one-window-one-groupBy
    shape under the conversation partitioning, so the groupBy reuses the
    window's Exchange and the whole lint is a single shuffle.

    ``epoch_col`` is epoch seconds as BIGINT rather than a timestamp
    type: the math is pure integer arithmetic, dialect-neutral, and
    avoids timestamp/interval syntax differences across engines.

    Returns ``(conv_id, n_turns, n_nonmonotonic, n_backward, min_gap_s,
    max_gap_s, span_s)``; ``min/max_gap_s`` are NULL for single-turn
    conversations.
    """
    w = W.partitionBy(conv_col).orderBy(idx_col)
    gap = (F.col(epoch_col) - F.lag(epoch_col).over(w)).cast("long")
    one_if = lambda c: F.sum(
        F.when(c, 1).otherwise(0)
    ).cast("long")
    g = t.select(conv_col, F.col(epoch_col).cast("long").alias("_e"),
                 gap.alias("_gap"))
    return g.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        one_if(F.col("_gap") <= 0).alias("n_nonmonotonic"),
        one_if(F.col("_gap") < 0).alias("n_backward"),
        F.min("_gap").alias("min_gap_s"),
        F.max("_gap").alias("max_gap_s"),
        (F.max("_e") - F.min("_e")).cast("long").alias("span_s"),
    )
