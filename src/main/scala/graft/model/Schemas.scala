package graft.model

/** Typed row models for the importer domain.
  *
  * These mirror the reference's data shapes (see SURVEY.md §1):
  *   - events: reference `event/events.go:4-13` (`NewInstance` /
  *     `InstanceCompleted`, both `{file_url, instance_id}`).
  *   - dimension rows: reference `model/models.go:13-34` (`DimensionID`,
  *     `Option`, `NodeID`, `code_list_id` extracted from nested
  *     `Links.CodeList.ID`, nullable `Order`).
  *   - instance: reference `model/models.go:72-87` (`InstanceID`,
  *     `CSVHeader []string`).
  *   - graph output: reference `store/store.go:14-25` modeled as node/edge
  *     DataFrames (GraphFrames-compatible shape).
  *
  * Case classes give `Dataset[T]` encoders where type safety helps; the
  * pipeline itself is DataFrame-first so Catalyst sees a fully declarative
  * plan (column pruning + predicate pushdown reach the parquet scans).
  */
final case class NewInstanceEvent(file_url: String, instance_id: String)

final case class InstanceCompletedEvent(file_url: String, instance_id: String)

/** One dimension option row; `order` is nullable on purpose — `None` means
  * "no canonical order defined" and downstream updates must stay partial
  * (reference `handler/incoming_instance_handler.go:250-266`).
  */
final case class DimensionRow(
    instance_id: String,
    dimension_id: String,
    option: String,
    node_id: String,
    code_list_id: String,
    order: Option[Int])

final case class InstanceRow(instance_id: String, csv_header: Seq[String])

final case class CodeListEntry(code_list_id: String, code: String, ord: Option[Int])

/** PATCH payload row (reference `client/dimensions_api.go:100-105`); rows
  * where both `node_id` is empty and `ord` is null are dropped before the
  * sink (reference `handler/incoming_instance_handler.go:243-267`).
  */
final case class OptionUpdate(
    instance_id: String,
    name: String,
    option: String,
    node_id: String,
    ord: Option[Int])

/** Graph node in GraphFrames-compatible shape. `props` is kept as a flat
  * string (k=v CSV) rather than MapType so results stay hash-comparable
  * across engines.
  */
final case class GraphNode(id: String, label: String, props: String)

final case class GraphEdge(src: String, dst: String, rel_type: String)

/** Dead-letter record (reference `message/kafka_message_receiver.go:44-50`). */
final case class DeadLetter(instance_id: String, err_context: String, error: String)
