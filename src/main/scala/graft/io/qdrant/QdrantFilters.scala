package graft.io.qdrant

import org.apache.spark.sql.sources._

/** Catalyst → Qdrant filter translation for the scroll read path.
  *
  * Spark's data-source filters on the point id and on `payload.*` fields
  * become Qdrant `must` conditions so filtering happens server-side and
  * only matching points cross the wire — the transfer is the dominant cost
  * of reading a remote vector collection. Untranslatable predicates simply
  * stay Spark-side; every pushed predicate ALSO stays in Spark's plan
  * (residual), so the server filter can only shrink traffic, never change
  * results. (Beyond-reference: qdrant/reader.py:244-245 only forwards a
  * user-supplied filter option verbatim.)
  *
  * Translation table (k = payload key, i.e. the attribute minus the
  * leading `payload.`):
  *  - `id = v` / `id IN (…)`            → `{"has_id": [...]}`
  *  - `k = v` (string/bool/integral)    → `{"key": k, "match": {"value": v}}`
  *  - `k IN (…)`                        → `{"key": k, "match": {"any": [...]}}`
  *  - `k >/>=/</<= n` (numeric)         → `{"key": k, "range": {…}}`
  *  - `k IS NULL`                       → `{"is_empty": {"key": k}}`
  *  - `k IS NOT NULL`                   → `{"must_not": [{"is_null": …}]}`
  *  - `AND`                             → both sides' conditions, concatenated
  */
object QdrantFilters {

  /** Conditions for the scroll request's `filter.must` list, or Nil when
    * nothing in the filter is expressible server-side. A partially
    * translatable AND pushes the translatable side only — sound because
    * the full predicate is re-applied by Spark.
    */
  def toMustConditions(filter: Filter): Seq[Map[String, Any]] = filter match {
    case And(l, r) => toMustConditions(l) ++ toMustConditions(r)
    case EqualTo("id", v) => hasId(Seq(v))
    case In("id", vs) => hasId(vs.toSeq)
    case EqualTo(a, v) => payloadKey(a).flatMap(k => matchValue(v).map(m =>
      Map[String, Any]("key" -> k, "match" -> Map("value" -> m)))).toSeq
    case EqualNullSafe(a, v) if v != null =>
      toMustConditions(EqualTo(a, v))
    case In(a, vs) =>
      val matches = vs.toSeq.map(matchValue)
      payloadKey(a).filter(_ => matches.forall(_.isDefined)).map(k =>
        Map[String, Any]("key" -> k,
          "match" -> Map("any" -> matches.flatten))).toSeq
    case GreaterThan(a, v) => range(a, "gt", v)
    case GreaterThanOrEqual(a, v) => range(a, "gte", v)
    case LessThan(a, v) => range(a, "lt", v)
    case LessThanOrEqual(a, v) => range(a, "lte", v)
    // is_empty, NOT is_null: Qdrant's is_null matches only keys PRESENT
    // with a null value, but a Spark-null payload field is usually a
    // MISSING key (this connector's own writer strips null values before
    // upsert). is_empty matches missing ∪ null ∪ [] — a superset of
    // Spark's IS NULL rows, so the residual Spark filter trims the []
    // case; is_null would under-match and silently lose rows.
    case IsNull(a) => payloadKey(a).map(k =>
      Map[String, Any]("is_empty" -> Map("key" -> k))).toSeq
    case IsNotNull(a) => payloadKey(a).map(k =>
      Map[String, Any]("must_not" ->
        Seq(Map("is_null" -> Map("key" -> k))))).toSeq
    case _ => Nil
  }

  /** True when at least part of the filter reached the server. */
  def isPushed(filter: Filter): Boolean = toMustConditions(filter).nonEmpty

  /** Merge pushed conditions into the (verbatim, user-supplied) config
    * filter map under `must` — Qdrant ANDs `must` entries, matching
    * Spark's conjunctive filter semantics.
    */
  def mergeIntoFilter(
      existing: Option[Map[String, Any]],
      conds: Seq[Map[String, Any]]): Map[String, Any] = {
    val base = existing.getOrElse(Map.empty)
    val prior = base.get("must") match {
      case Some(s: Seq[_]) => s.map(_.asInstanceOf[Any])
      case Some(other) => Seq(other)
      case None => Nil
    }
    base + ("must" -> (prior ++ conds))
  }

  private def hasId(vs: Seq[Any]): Seq[Map[String, Any]] = {
    val ids = vs.map(idValue)
    if (ids.forall(_.isDefined)) Seq(Map("has_id" -> ids.flatten)) else Nil
  }

  /** Qdrant point ids are unsigned integers or UUID strings. */
  private def idValue(v: Any): Option[Any] = v match {
    case null => None
    case n @ (_: java.lang.Integer | _: java.lang.Long |
        _: java.lang.Short | _: java.lang.Byte) => Some(n)
    case s: String => Some(s)
    case _ => None
  }

  /** `payload.<key>` → key; nested structs keep their dotted path, which is
    * exactly Qdrant's nested-payload key syntax.
    */
  private def payloadKey(attribute: String): Option[String] =
    if (attribute.startsWith("payload.") && attribute.length > 8)
      Some(attribute.substring(8))
    else None

  /** Qdrant `match` supports keyword / integer / bool values — floats are
    * range-only, so an equality on a double stays Spark-side.
    */
  private def matchValue(v: Any): Option[Any] = v match {
    case null => None
    case s: String => Some(s)
    case b: java.lang.Boolean => Some(b)
    case n @ (_: java.lang.Integer | _: java.lang.Long |
        _: java.lang.Short | _: java.lang.Byte) => Some(n)
    case _ => None
  }

  private def range(attribute: String, op: String, v: Any): Seq[Map[String, Any]] =
    (payloadKey(attribute), v) match {
      case (Some(k), n: java.lang.Number) =>
        Seq(Map[String, Any]("key" -> k, "range" -> Map(op -> n)))
      case _ => Nil
    }
}
