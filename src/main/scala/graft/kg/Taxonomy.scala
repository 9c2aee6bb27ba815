package graft.kg

/** A label taxonomy: child -> parent (single inheritance), with precomputed
  * hypernym closures. The reference loads its taxonomy from YAML alongside
  * the grammar (biogrammar/taxonomy.yml, consumed via
  * main/.../reach/package.scala:10-22); here the taxonomy is a first-class
  * value carried by [[BioRules.Grammar]] so a data-loaded taxonomy ships to
  * executors on the same broadcast as the rules it scopes.
  *
  * Closures for every label named in the parents map are precomputed at
  * construction (immutable map — zero contention on the extraction hot
  * path); unknown heads fall back to an on-the-fly walk, exactly as the
  * previous static implementation did.
  */
final case class Taxonomy(parents: Map[String, String]) {

  private def compute(head: String): Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer(head)
    var cur = head
    while (parents.contains(cur)) {
      cur = parents(cur)
      if (buf.contains(cur))
        throw new IllegalArgumentException(
          s"taxonomy cycle through '$cur' (closure of '$head')")
      buf += cur
    }
    buf.toArray
  }

  /** Eager cycle check + closure precompute; invalid user taxonomies fail at
    * load time on the driver, not mid-task on an executor.
    */
  @transient private lazy val closures: Map[String, Array[String]] =
    (parents.keySet ++ parents.values).map(l => l -> compute(l)).toMap

  def closure(head: String): Array[String] =
    closures.getOrElse(head, compute(head))

  /** Driver-side validation hook (forces the precompute, surfacing cycles). */
  def validated: Taxonomy = { closures; this }
}
