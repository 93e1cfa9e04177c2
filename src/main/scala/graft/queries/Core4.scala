package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{Dedup, Relational}

/** Round-4 additions: recursive-CTE fixpoint (WITH RECURSIVE is reachable
  * through the reference's SQL entry points, SDF.swift:295-304 — SQLite
  * supports it, Spark has no native recursive CTE), dedup-group
  * resolution via connected components, and further parity surface. */
object Core4 {
  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // WITH RECURSIVE (UNION ALL form): walk the per-region nation chain
    // (each nation points at the next nationkey in its region) from each
    // region's root, carrying root + depth. Spark side is
    // Relational.recursiveFixpoint — a driver-coordinated loop whose per-
    // round job touches only the frontier; the oracle is DuckDB's native
    // recursive CTE over the identical edge derivation.
    QueryDef("q61_recursive_cte", (s, dir) => {
      import s.implicits._
      val nation = t(s, dir, "nation")
      val w = Window.partitionBy($"n_regionkey").orderBy($"n_nationkey")
      val edges = nation
        .select($"n_regionkey", $"n_nationkey".as("src"),
          lead($"n_nationkey", 1).over(w).as("dst"))
        .filter($"dst".isNotNull)
        .select($"src", $"dst")
      val roots = nation.groupBy($"n_regionkey")
        .agg(min($"n_nationkey").as("node"))
        .select($"node", $"node".as("root"), lit(0).as("depth"))
      val walk = Relational.recursiveFixpoint(
        roots,
        frontier => frontier.join(edges, frontier("node") === edges("src"))
          .select(edges("dst").as("node"), frontier("root"),
            (frontier("depth") + 1).as("depth")),
        maxIter = 30, distinctUnion = false)
      walk.select($"node".as("n_nationkey"), $"root", $"depth")
        .orderBy($"n_nationkey")
    }, Some("""
      WITH RECURSIVE
      e AS (SELECT n_nationkey AS src,
                   lead(n_nationkey) OVER (PARTITION BY n_regionkey
                                           ORDER BY n_nationkey) AS dst
            FROM nation),
      edges AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
      roots AS (SELECT min(n_nationkey) AS node FROM nation GROUP BY n_regionkey),
      walk(node, root, depth) AS (
        SELECT node, node, CAST(0 AS INT) FROM roots
        UNION ALL
        SELECT edges.dst, walk.root, walk.depth + 1
        FROM walk JOIN edges ON edges.src = walk.node)
      SELECT node AS n_nationkey, root, depth FROM walk ORDER BY n_nationkey""")),

    // Dedup-group resolution: connected components over the exact n-gram
    // Jaccard pairs (d04's definition), then one row per clustered doc
    // with its component (= canonical doc id, the group minimum). The
    // oracle recomputes the same pairs in SQL and resolves components
    // through DuckDB's recursive CTE (min reachable id per node) — a
    // fully independent fixpoint implementation.
    QueryDef("d07_dedup_components", (s, dir) => {
      import s.implicits._
      val pairs = Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id",
        "text", k = 3, threshold = 0.1)
      val comp = Dedup.connectedComponents(pairs, "id1", "id2")
      comp.select($"node".as("doc_id"), $"component")
        .orderBy($"doc_id")
    }, Some("""
      WITH RECURSIVE
      t AS (SELECT doc_id,
              regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
            FROM documents),
      sh AS MATERIALIZED (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE [array_to_string(w, ' ')] END) AS sh FROM t),
      p AS MATERIALIZED (SELECT a.doc_id AS id1, b.doc_id AS id2
            FROM sh a, sh b WHERE a.doc_id < b.doc_id
              AND round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) >= 0.1),
      edges AS (SELECT id1 AS src, id2 AS dst FROM p
                UNION SELECT id2, id1 FROM p),
      reach(node, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.node)
      SELECT node AS doc_id, min(r) AS component
      FROM reach GROUP BY node ORDER BY doc_id""")),

    // TF-IDF keyword extraction (TextOps.tfidfTopTerms): same tokenizer
    // as q55, idf = ln(N/df), per-doc top-3. The oracle recomputes the
    // whole derivation in SQL — both engines do the double math in the
    // same order (tf * ln(N/df)) so round(4) agrees.
    QueryDef("t05_tfidf", (s, dir) => {
      import s.implicits._
      graft.operators.TextOps
        .tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", topK = 3)
        .filter($"doc_id" <= 20)
        .orderBy($"doc_id", $"rnk")
    }, Some("""
      WITH toks AS MATERIALIZED (
        SELECT doc_id, unnest(list_filter(
          string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' '),
          x -> x <> '')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 4) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n),
      ranked AS (
        SELECT doc_id, term, tfidf,
               CAST(row_number() OVER (PARTITION BY doc_id
                 ORDER BY tfidf DESC, term) AS INT) AS rnk
        FROM scored)
      SELECT doc_id, term, tfidf, rnk FROM ranked
      WHERE rnk <= 3 AND doc_id <= 20 ORDER BY doc_id, rnk""")),

    // PII redaction (TextOps.redactPii): the corpus has no PII, so both
    // sides append the same deterministic synthetic contact line to each
    // doc, then count + redact it with identical RE2-safe patterns. The
    // hash pins the exact redacted text.
    QueryDef("t06_pii_redact", (s, dir) => {
      import s.implicits._
      import graft.operators.TextOps
      val aug = concat($"text", lit(" Contact user"), $"doc_id",
        lit("@mail.example.com or call +1-555-"),
        lpad($"doc_id".cast(StringType), 7, "0"), lit("."))
      t(s, dir, "documents")
        .filter($"doc_id" <= 50)
        .select($"doc_id",
          TextOps.emailCount(aug).cast(LongType).as("n_emails"),
          TextOps.phoneCount(aug).cast(LongType).as("n_phones"),
          md5(TextOps.redactPii(aug).cast(BinaryType)).as("fp"))
        .orderBy($"doc_id")
    }, Some("""
      WITH aug AS (
        SELECT doc_id,
               text || ' Contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com or call +1-555-'
                    || lpad(CAST(doc_id AS VARCHAR), 7, '0') || '.' AS a
        FROM documents WHERE doc_id <= 50)
      SELECT doc_id,
             CAST(len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(a, '\+[0-9][0-9\-]{7,}[0-9]')) AS BIGINT) AS n_phones,
             md5(regexp_replace(regexp_replace(a,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\+[0-9][0-9\-]{7,}[0-9]', '<PHONE>', 'g')) AS fp
      FROM aug ORDER BY doc_id"""))
  )
}
