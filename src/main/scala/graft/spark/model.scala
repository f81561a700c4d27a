package graft.spark

import java.sql.Timestamp

/** One transcript turn — the engine's only input shape
  * (BASELINE.json `input_hint`): Iceberg-shaped table
  * (conv_id, turn_idx, role, text, tool, ts). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Character span of one retained block within `extracted_text`
  * (engine addition per the north star). */
final case class Span(start: Int, end: Int)

/** Extraction output row (FIXTURES.md §4). */
final case class ExtractedTurn(
    conv_id: String,
    turn_idx: Int,
    confidence: Double,
    extracted_html: String,
    extracted_text: String,
    spans: Array[Span],
    failed: Boolean)

/** Per-partition lineage row written to the metrics table (north rule:
  * resumable runs with per-partition lineage — input snapshot id,
  * partition hash, extracted-turn count, score histogram). */
final case class LineageRow(
    input_fingerprint: String,
    bucket: Int,
    extracted_turns: Long,
    failed_turns: Long,
    empty_turns: Long,
    score_histogram: Array[Long],
    wall_ms: Long)
