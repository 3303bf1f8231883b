package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._

import graft.queries.Registry.Q
import graft.sketch.{Cms, HdrHistogram, Hll}
import graft.text.TextAnalysis

/** Driver-contract queries for the mergeable sketch layer (approximate
  * profiling at corpus scale): HyperLogLog distinct counts, count-min
  * frequencies, HDR-histogram quantiles. Every sketch here is pure
  * md5/bit-length algebra, so the DuckDB twins replay bucket layouts
  * bit-for-bit; only display values round (the [[Parity]] contract).
  *
  * Reference analogue: the validation suite's exact `count(distinct …)` /
  * frequency / percentile profiles (validate_anonymization.py), which
  * re-scan the warehouse on every run — these are their bounded-memory,
  * incrementally-maintainable replacements for the 100 TB corpus.
  */
object SketchQueries {

  import ExtensionQueries.duckTokens
  import Parity.{duckRound, roundHalfUp}

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.read(s, dir, "documents")

  val all: ListMap[String, Q] = ListMap(
    "q_hll_distinct" -> Q(
      (s, dir) => {
        val d = docs(s, dir)
        val est = Hll.estimate(
          Hll.sketch(d, col("text"), Seq("source")), Seq("source"))
        val exact = d
          .filter(col("text").isNotNull)
          .groupBy(col("source"))
          .agg(countDistinct(col("text")).as("exact_distinct"))
        exact
          .join(est, Seq("source"))
          .select(
            col("source"),
            col("exact_distinct"),
            roundHalfUp(col("est_distinct"), 4)
              .cast("decimal(18,4)").as("est_distinct"))
          .orderBy("source")
      },
      // full HLL replay: same 60-bit md5 hash, same bucket/rho split, same
      // alpha and linear-counting branch — the exact column beside it makes
      // the accuracy auditable in the output itself
      Some(s"""
        with sk as (
          select source,
            ${Hll.duck.bucket("text")} as bucket,
            max(${Hll.duck.rho("text")}) as r
          from documents where text is not null
          group by source, bucket
        ),
        est as (
          select source, ${Hll.duck.estimateExpr()} as est
          from sk group by source
        ),
        ex as (
          select source, count(distinct text) as exact_distinct
          from documents where text is not null group by source
        )
        select ex.source, exact_distinct,
          cast(${duckRound("est", 4)} as decimal(18,4)) as est_distinct
        from ex join est using (source)
        order by source"""
      )
    ),
    "q_hll_merged" -> Q(
      (s, dir) => {
        // mergeability is the property under test: per-source sketches
        // merged with union+max must estimate IDENTICALLY to one global
        // sketch (max is associative), so incremental per-batch profiling
        // loses nothing vs a full rebuild. Single-row aggregates joined by
        // broadcast cross (the scalar-subquery pattern).
        val d = docs(s, dir)
        val perSource = Hll.sketch(d, col("text"), Seq("source"))
        val merged = Hll.estimate(
          Hll.merge(perSource.select(col("bucket"), col("r"))))
          .select(roundHalfUp(col("est_distinct"), 4)
            .cast("decimal(18,4)").as("est_merged"))
        val direct = Hll.estimate(Hll.sketch(d, col("text")))
          .select(roundHalfUp(col("est_distinct"), 4)
            .cast("decimal(18,4)").as("est_direct"))
        val exact = d
          .filter(col("text").isNotNull)
          .agg(countDistinct(col("text")).as("exact_distinct"))
        merged.crossJoin(broadcast(direct)).crossJoin(broadcast(exact))
      },
      Some(s"""
        with persrc as (
          select source,
            ${Hll.duck.bucket("text")} as bucket,
            max(${Hll.duck.rho("text")}) as r
          from documents where text is not null
          group by source, bucket
        ),
        mergedsk as (
          select bucket, max(r) as r from persrc group by bucket
        ),
        m as (select ${Hll.duck.estimateExpr()} as est from mergedsk),
        directsk as (
          select ${Hll.duck.bucket("text")} as bucket,
            max(${Hll.duck.rho("text")}) as r
          from documents where text is not null group by bucket
        ),
        dct as (select ${Hll.duck.estimateExpr()} as est from directsk),
        ex as (
          select count(distinct text) as exact_distinct
          from documents where text is not null
        )
        select
          cast(${duckRound("m.est", 4)} as decimal(18,4)) as est_merged,
          cast(${duckRound("dct.est", 4)} as decimal(18,4)) as est_direct,
          exact_distinct
        from m cross join dct cross join ex"""
      )
    ),
    "q_cms_freq" -> Q(
      (s, dir) => {
        // count-min point queries for the exact top-30 tokens: the output
        // carries exact count and sketch estimate side by side, so the
        // never-undercount guarantee is visible (and hash-checked) per row
        val toks = docs(s, dir)
          .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        val sk = Cms.sketch(toks, col("tok"))
        val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
        val top = exact.orderBy(col("exact_cnt").desc, col("tok")).limit(30)
        Cms.estimate(sk, top, col("tok"))
          .withColumnRenamed("value", "tok")
          .join(top, Seq("tok"))
          .select(col("tok"), col("exact_cnt"), col("cms_est"))
          .orderBy("tok")
      },
      Some {
        val probes = (0 until Cms.DefaultD).map { j =>
          s"select tok, $j as hrow, ${Cms.duck.bucket(j, "tok")} as bucket from top"
        }.mkString(" union all ")
        val cells = (0 until Cms.DefaultD).map { j =>
          s"select $j as hrow, ${Cms.duck.bucket(j, "tok")} as bucket, " +
            "count(*) as cnt from toks group by bucket"
        }.mkString(" union all ")
        s"""
        with toks as (
          select unnest($duckTokens) as tok from documents
        ),
        cells as ($cells),
        exact as (select tok, count(*) as exact_cnt from toks group by tok),
        top as (
          select tok, exact_cnt from exact
          order by exact_cnt desc, tok limit 30
        ),
        probes as ($probes),
        est as (
          select p.tok, min(coalesce(c.cnt, 0)) as cms_est
          from probes p left join cells c on p.hrow = c.hrow and p.bucket = c.bucket
          group by p.tok
        )
        select top.tok, exact_cnt, cms_est
        from top join est using (tok)
        order by tok"""
      }
    ),
    "q_profile_approx" -> Q(
      (s, dir) => {
        // the scale twin of q_profile: per-column distinct ESTIMATES from
        // one exploded sketch pass (state capped at m buckets/column)
        // beside exact nonnull counts from a plain narrow agg — no
        // multi-distinct Expand, no per-distinct-value state
        val d = docs(s, dir)
        val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val est = Hll.estimate(Hll.sketchColumns(d, cols), Seq("col_name"))
        val nnAggs = cols.map(c => count(col(c)).as(s"_nn_$c"))
        val nnRows = cols.map(c =>
          struct(lit(c).as("col_name"), col(s"_nn_$c").as("n_nonnull")))
        val nonnull = d
          .agg(nnAggs.head, nnAggs.tail: _*)
          .select(explode(array(nnRows: _*)).as("r"))
          .select(col("r.col_name"), col("r.n_nonnull"))
        nonnull
          .join(est, Seq("col_name"))
          .select(
            col("col_name"),
            col("n_nonnull"),
            roundHalfUp(col("est_distinct"), 4)
              .cast("decimal(18,4)").as("est_distinct"))
          .orderBy("col_name")
      },
      Some {
        val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val sketches = cols.map { c =>
          val v = if (c == "doc_id" || c == "n_chars") s"cast($c as varchar)" else c
          s"""sk_$c as (
            select ${Hll.duck.bucket(v)} as bucket, max(${Hll.duck.rho(v)}) as r
            from documents where $c is not null group by bucket
          ),
          est_$c as (select ${Hll.duck.estimateExpr()} as est from sk_$c)"""
        }.mkString(",\n        ")
        val branches = cols.map { c =>
          s"select '$c' as col_name, count($c) as n_nonnull from documents"
        }.mkString(" union all ")
        val ests = cols.map(c =>
          s"select '$c' as col_name, est from est_$c").mkString(" union all ")
        s"""
        with $sketches,
        nn as ($branches),
        es as ($ests)
        select nn.col_name, n_nonnull,
          cast(${duckRound("est", 4)} as decimal(18,4)) as est_distinct
        from nn join es using (col_name)
        order by col_name"""
      }
    ),
    "q_bloom_decontam" -> Q(
      (s, dir) => {
        // bloom-prefiltered decontamination: the oracle is the EXACT
        // overlap replay — bloom admits no false negatives and survivors
        // are exactly confirmed, so any bit the filter got wrong
        // hash-fails the whole query. Build is one bounded driver collect
        // (256 KiB bitset; PlanGuardSpec exemption).
        val d = docs(s, dir)
        graft.text.Decontaminate
          .overlapStatsBloom(
            corpus = d.filter(col("doc_id") % 40 =!= 0),
            benchmark = d.filter(col("doc_id") % 40 === 0),
            "doc_id",
            col("text"),
            k = 5)
          .select(
            col("doc_id"),
            col("n_shingles"),
            col("n_overlap"),
            roundHalfUp(col("overlap_frac"), 6)
              .cast("decimal(9,6)").as("overlap_frac"))
          .orderBy("doc_id")
      },
      // exact 5-shingle overlap twin (q_decontaminate pattern, %40 split)
      Some(s"""
        with t as (select doc_id, $duckTokens as toks from documents),
        sh as (
          select doc_id,
            list_distinct(list_transform(
              range(1, cast(greatest(len(toks) - 4, 1) as int) + 1),
              i -> array_to_string(list_slice(toks, i, i + 4), ' '))) as shs
          from t
        ),
        ex as (select doc_id, unnest(shs) as shingle from sh),
        bench as (select distinct shingle from ex where doc_id % 40 = 0),
        corp as (select * from ex where doc_id % 40 <> 0),
        tot as (select doc_id, count(*) as n_shingles from corp group by doc_id),
        ov as (
          select c.doc_id, count(*) as n_overlap
          from corp c join bench b using (shingle) group by c.doc_id
        )
        select tot.doc_id, n_shingles,
          coalesce(n_overlap, 0) as n_overlap,
          cast(${duckRound("coalesce(n_overlap, 0) / cast(n_shingles as double)", 6)}
               as decimal(9,6)) as overlap_frac
        from tot left join ov using (doc_id) order by doc_id"""
      )
    ),
    // CMS inner-product join-size estimation: plan-time cardinality
    // telemetry from two 4096-cell artifacts, exact count alongside so the
    // never-undercount bound is hash-checked per pair.
    "q_join_size_est" -> Q(
      (s, dir) => {
        val orders = Tables.read(s, dir, "orders")
        val cust = Tables.read(s, dir, "customer")
        val li = Tables.read(s, dir, "lineitem")
        def pair(
            a: org.apache.spark.sql.DataFrame, ca: String,
            b: org.apache.spark.sql.DataFrame, cb: String,
            name: String) = {
          val est = Cms.joinSizeEstimate(
            Cms.sketch(a, col(ca).cast("string")),
            Cms.sketch(b, col(cb).cast("string")))
          val exact = a
            .join(b, a(ca) === b(cb))
            .agg(count(lit(1)).as("exact_n"))
          est
            .crossJoin(broadcast(exact))
            .select(
              lit(name).as("pair"),
              col("join_size_est"),
              col("exact_n"))
        }
        pair(orders, "o_custkey", cust, "c_custkey", "orders_customer")
          .unionAll(pair(li, "l_orderkey", orders, "o_orderkey", "lineitem_orders"))
          .orderBy("pair")
      },
      Some {
        def side(tbl: String, key: String, alias: String) =
          (0 until Cms.DefaultD).map { j =>
            s"select $j as hrow, ${Cms.duck.bucket(j, s"cast($key as varchar)")} as bucket, " +
              s"count(*) as cnt from $tbl group by bucket"
          }.mkString(" union all ")
        def pairSql(ta: String, ka: String, tb: String, kb: String, name: String) =
          s"""
          select '$name' as pair,
            (with ca as (${side(ta, ka, "a")}),
                  cb as (${side(tb, kb, "b")}),
                  dots as (
                    select a.hrow, sum(a.cnt * b.cnt) as dot
                    from ca a join cb b on a.hrow = b.hrow and a.bucket = b.bucket
                    group by a.hrow
                  )
             select cast(min(coalesce(dot, 0)) as bigint)
             from range(${Cms.DefaultD}) spine(j)
             left join dots on dots.hrow = spine.j) as join_size_est,
            (select count(*) from $ta join $tb on $ka = $kb) as exact_n"""
        s"""
        ${pairSql("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem_orders")}
        union all
        ${pairSql("orders", "o_custkey", "customer", "c_custkey", "orders_customer")}
        order by pair"""
      }
    ),
    // Sketch-based percentile-rank normalization: one histogram pass + a
    // broadcast bucket join replaces the global per-group sort that exact
    // percent_rank costs; the exact rank rides along for audit, so the
    // hash check pins the sketch rank to within its bucket resolution.
    "q_pct_rank" -> Q(
      (s, dir) => {
        import graft.sketch.HdrHistogram
        import org.apache.spark.sql.expressions.Window
        val li = Tables.read(s, dir, "lineitem")
        val sk = HdrHistogram.sketch(li, col("l_extendedprice"), Seq("l_returnflag"))
        HdrHistogram
          .percentileRank(sk, li, col("l_extendedprice"), Seq("l_returnflag"))
          .withColumn(
            "exact_pr",
            percent_rank().over(
              Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))))
          .filter(col("l_orderkey") % 37 === 0)
          .select(
            col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            col("l_extendedprice"),
            roundHalfUp(col("pct_rank"), 6).cast("decimal(9,6)").as("pct_rank"),
            roundHalfUp(col("exact_pr"), 6).cast("decimal(9,6)").as("exact_pr"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some {
        import graft.sketch.HdrHistogram
        s"""
        with sk as (
          select l_returnflag, ${HdrHistogram.duck.idx("l_extendedprice")} as idx,
            count(*) as cnt
          from lineitem
          where l_extendedprice is not null and l_extendedprice >= 0
          group by l_returnflag, idx
        ),
        c as (
          select l_returnflag, idx,
            sum(cnt) over (partition by l_returnflag order by idx) as cum,
            sum(cnt) over (partition by l_returnflag) as n
          from sk
        ),
        r as (
          select l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
            ${HdrHistogram.duck.idx("l_extendedprice")} as idx,
            percent_rank() over (partition by l_returnflag
                                 order by l_extendedprice) as epr
          from lineitem
          where l_extendedprice is not null and l_extendedprice >= 0
        )
        select r.l_orderkey, r.l_linenumber, r.l_returnflag, r.l_extendedprice,
          cast(${duckRound("cast(cum as double) / cast(n as double)", 6)}
               as decimal(9,6)) as pct_rank,
          cast(${duckRound("epr", 6)} as decimal(9,6)) as exact_pr
        from r join c on r.l_returnflag = c.l_returnflag and r.idx = c.idx
        where r.l_orderkey % 37 = 0
        order by r.l_orderkey, r.l_linenumber"""
      }
    ),
    "q_hdr_quantiles" -> Q(
      (s, dir) => {
        val li = Tables.read(s, dir, "lineitem")
        val sk = HdrHistogram.sketch(
          li, col("l_extendedprice"), Seq("l_returnflag"))
        HdrHistogram
          .quantiles(sk, Seq(0.5, 0.9, 0.99), Seq("l_returnflag"))
          .select(
            col("l_returnflag"),
            col("q"),
            roundHalfUp(col("est"), 6).cast("decimal(18,6)").as("est"))
          .orderBy("l_returnflag", "q")
      },
      Some {
        def pick(q: String) =
          s"""select l_returnflag, cast($q as double) as q, min(idx) as idx
              from c where cum >= greatest(ceil($q * n), 1)
              group by l_returnflag"""
        s"""
        with sk as (
          select l_returnflag,
            ${HdrHistogram.duck.idx("l_extendedprice")} as idx,
            count(*) as cnt
          from lineitem
          where l_extendedprice is not null and l_extendedprice >= 0
          group by l_returnflag, idx
        ),
        c as (
          select l_returnflag, idx,
            sum(cnt) over (partition by l_returnflag order by idx) as cum,
            sum(cnt) over (partition by l_returnflag) as n
          from sk
        ),
        pick as (
          ${pick("0.5")} union all ${pick("0.9")} union all ${pick("0.99")}
        )
        select l_returnflag, q,
          cast(${duckRound(HdrHistogram.duck.mid("idx"), 6)}
               as decimal(18,6)) as est
        from pick
        order by l_returnflag, q"""
      }
    )
  )
}
