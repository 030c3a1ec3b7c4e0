package graft.osm

/** Typed entity model (SURVEY §1.4's Dataset mapping): case classes +
  * implicit product encoders give compile-time-checked access to the
  * committed tables — the `Dataset[T]` face of the same parquet the
  * DataFrame operators scan (S5/S6: element encode/decode, here via
  * Catalyst `ExpressionEncoder` instead of hand serialization,
  * cf. capnp builders `/root/reference/src/expand.cpp:157-225`).
  *
  * `meta` is optional: CDC-upserted rows may carry no metadata
  * (`osm/Changeset` writes null meta), and `Option[Meta]` decodes a
  * null struct as None instead of throwing.
  */
object OsmModel {

  final case class Meta(version: Int, timestamp: Long, changeset: Long,
                        uid: Long, user: String)

  /** An untagged node's coordinates (the `locations` table; 1e7
    * fixed-point ints). */
  final case class Location(id: Long, lon: Int, lat: Int, version: Int)

  /** A tagged node (coords live in [[Location]] — same split as the
    * reference's locations/nodes sub-databases). */
  final case class Node(id: Long, tags: Map[String, String],
                        meta: Option[Meta])

  final case class Member(ref: Long, mtype: String, role: String)

  final case class Way(id: Long, nodes: Seq[Long],
                       tags: Map[String, String], meta: Option[Meta])

  final case class Relation(id: Long, members: Seq[Member],
                            tags: Map[String, String], meta: Option[Meta])
}
