package graft.pipeline

/** DuckDB oracle SQL for every [[PipelineOps]] entry.
  *
  * Generated from the same [[Hashing]] constants as the Spark plans, so the
  * minhash permutations / LSH planes are bit-identical literals on both
  * sides. Integer sums are CAST to BIGINT (DuckDB widens int sums to
  * HUGEINT), and double-valued outputs are divisions/sqrt of exact integers
  * or DECIMAL sums — the same determinism rules as the Spark side.
  */
object PipelineOracles {
  import Hashing._

  /** First 12 hex chars of md5(x) as BIGINT (48 bits, exact). The loop
    * variable is namespaced so callers can embed this inside their own
    * comprehensions without shadowing. */
  private def hex12(x: String): String =
    s"list_sum([ (strpos('0123456789abcdef', substr(md5($x), hx, 1)) - 1)::BIGINT * (1::BIGINT << (4*(12-hx))) FOR hx IN range(1, 13) ])"

  /** 63-bit md5 prefix as BIGINT — top hex char masked to 3 bits plus the
    * next 15 chars; the exact arithmetic twin of PipelineOps.hex63. */
  private def hex63(x: String): String =
    s"(((strpos('0123456789abcdef', substr(md5($x), 1, 1)) - 1)::BIGINT % 8) * (1::BIGINT << 60)" +
      s" + list_sum([ (strpos('0123456789abcdef', substr(md5($x), hx, 1)) - 1)::BIGINT * (1::BIGINT << (4*(16-hx))) FOR hx IN range(2, 17) ]))"

  private def sqlList(xs: Seq[String]): String = xs.map(s => s"'$s'").mkString(", ")

  private val p01 =
    """WITH t AS (SELECT lang, len(string_split(text, ' '))::BIGINT AS n_tokens, n_chars FROM documents)
      |SELECT lang, count(*)::BIGINT AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(CAST(sum(n_tokens) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_tokens
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  private val p02 =
    s"""WITH t AS (
       |  SELECT source, toks, len(toks)::BIGINT AS n_tokens,
       |         len(list_filter(toks, t -> list_contains([${sqlList(PipelineOps.Stopwords)}], t)))::BIGINT AS n_stop
       |  FROM (SELECT source, string_split(text, ' ') AS toks FROM documents))
       |SELECT source, count(*)::BIGINT AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |       CAST(sum(n_stop) AS BIGINT) AS sum_stop,
       |       CAST(sum(CASE WHEN n_tokens < 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_short_docs,
       |       CAST(CAST(sum(n_stop) AS BIGINT) AS DOUBLE) / CAST(CAST(sum(n_tokens) AS BIGINT) AS DOUBLE) AS stop_ratio
       |FROM t GROUP BY source ORDER BY source""".stripMargin

  private val p03 =
    """WITH t AS (
      |  SELECT source, n_chars, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |  FROM documents)
      |SELECT source, count(*)::BIGINT AS n_docs,
      |       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       CAST(sum(CASE WHEN rn = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
      |FROM t GROUP BY source ORDER BY source""".stripMargin

  /** Shared doc → distinct shingles → distinct base hashes CTE prefix. */
  private val shingleCtes =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (
       |  SELECT doc_id,
       |         list_distinct([toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]) AS shingles
       |  FROM t WHERE len(toks) >= 2),
       |h AS (
       |  SELECT doc_id, shingles,
       |         list_distinct(list_transform(shingles, s -> ${hex12("s")} % $BaseHashMod)) AS hashes
       |  FROM s)""".stripMargin

  private val p04 = {
    val sigs = (0 until NumHashes).map { j =>
      s"list_min([ (${minhashA(j)} * h + ${minhashB(j)}) % $P FOR h IN hashes ])"
    }.mkString(",\n         ")
    s"""$shingleCtes,
       |sig AS (SELECT doc_id, [$sigs] AS sig FROM h),
       |banded AS (
       |  SELECT doc_id, b, sig[2*b+1]::VARCHAR || '_' || sig[2*b+2]::VARCHAR AS bkey
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, $Bands)) AS b)),
       |pruned AS (
       |  SELECT doc_id, b, bkey FROM (
       |    SELECT doc_id, b, bkey, count(*) OVER (PARTITION BY b, bkey) AS cnt FROM banded)
       |  WHERE cnt <= $MaxBucketSize),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM pruned l JOIN pruned r ON l.b = r.b AND l.bkey = r.bkey AND l.doc_id < r.doc_id),
       |pf AS (
       |  SELECT doc_a, doc_b FROM cand
       |  JOIN sig s1 ON s1.doc_id = doc_a JOIN sig s2 ON s2.doc_id = doc_b
       |  WHERE len(list_filter(list_zip(s1.sig, s2.sig), x -> x[1] = x[2])) >= $MinSigMatches),
       |j AS (
       |  SELECT doc_a, doc_b,
       |         len(list_intersect(ha.hashes, hb.hashes))::BIGINT AS inter,
       |         len(ha.hashes)::BIGINT AS ca, len(hb.hashes)::BIGINT AS cb
       |  FROM pf JOIN h ha ON ha.doc_id = doc_a JOIN h hb ON hb.doc_id = doc_b)
       |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / CAST(ca + cb - inter AS DOUBLE) AS jaccard
       |FROM j WHERE CAST(inter AS DOUBLE) / CAST(ca + cb - inter AS DOUBLE) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  private val p05 =
    s"""WITH t AS (
       |  SELECT lang, list_transform(string_split(text, ' '), t -> ${hex12("t")}) AS hashes
       |  FROM documents),
       |f AS (
       |  SELECT lang,
       |         list_sum([ CASE WHEN 2 * list_sum([ ((h >> b) & 1) FOR h IN hashes ]) > len(hashes)
       |                    THEN (1::BIGINT << b) ELSE 0::BIGINT END FOR b IN range(0, 48) ]) AS simhash
       |  FROM t)
       |SELECT lang, count(*)::BIGINT AS n_docs, count(DISTINCT simhash)::BIGINT AS n_fingerprints
       |FROM f GROUP BY lang ORDER BY lang""".stripMargin

  private val p35 = {
    val blocks = PipelineOps.SimhashBlocks
    val bits = PipelineOps.SimhashBlockBits
    val mask = (1L << bits) - 1
    s"""WITH t AS (
       |  SELECT doc_id, list_transform(string_split(text, ' '), t -> ${hex12("t")}) AS hashes
       |  FROM documents),
       |f AS (
       |  SELECT doc_id,
       |         list_sum([ CASE WHEN 2 * list_sum([ ((h >> b) & 1) FOR h IN hashes ]) > len(hashes)
       |                    THEN (1::BIGINT << b) ELSE 0::BIGINT END FOR b IN range(0, 48) ]) AS fp
       |  FROM t),
       |banded AS (
       |  SELECT doc_id, blk, (fp >> ($bits * blk)) & $mask AS bval
       |  FROM f CROSS JOIN (SELECT unnest(range(0, $blocks)) AS blk)),
       |pruned AS (
       |  SELECT doc_id, blk, bval FROM (
       |    SELECT doc_id, blk, bval, count(*) OVER (PARTITION BY blk, bval) AS cnt FROM banded)
       |  WHERE cnt <= $MaxBucketSize),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM pruned l JOIN pruned r
       |    ON l.blk = r.blk AND l.bval = r.bval AND l.doc_id < r.doc_id),
       |v AS (
       |  SELECT cand.doc_a, cand.doc_b, bit_count(xor(fa.fp, fb.fp))::BIGINT AS hamming
       |  FROM cand JOIN f fa ON fa.doc_id = cand.doc_a JOIN f fb ON fb.doc_id = cand.doc_b)
       |SELECT doc_a, doc_b, hamming FROM v
       |WHERE hamming <= ${PipelineOps.SimhashMaxHamming}
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  private val p06 =
    s"""WITH g AS (
       |  SELECT doc_id, lang, source, CAST(floor(n_chars / 100.0) AS BIGINT) AS block,
       |         list_distinct([ (${hex12("substr(text, i, 3)")})::BIGINT FOR i IN range(1, len(text) - 1) ]) AS grams
       |  FROM documents WHERE len(text) >= 3),
       |j AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         len(list_intersect(a.grams, b.grams))::BIGINT AS inter,
       |         len(a.grams)::BIGINT AS ca, len(b.grams)::BIGINT AS cb
       |  FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.block = b.block AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / CAST(ca + cb - inter AS DOUBLE) AS jaccard
       |FROM j WHERE CAST(inter AS DOUBLE) / CAST(ca + cb - inter AS DOUBLE) >= 0.6
       |ORDER BY doc_a, doc_b""".stripMargin

  private val quantCte =
    s"""WITH qz AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QuantScale) AS BIGINT)) AS q
       |  FROM embeddings),
       |n AS (SELECT vec_id, q, list_sum([x[1] * x[2] FOR x IN list_zip(q, q)]) AS nrm FROM qz)""".stripMargin

  private val p07 =
    s"""$quantCte,
       |pairs AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS nbr_id,
       |         list_sum([x[1] * x[2] FOR x IN list_zip(a.q, b.q)]) AS dot,
       |         a.nrm AS na, b.nrm AS nb
       |  FROM n a CROSS JOIN n b WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id),
       |scored AS (
       |  SELECT query_id, nbr_id,
       |         CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine
       |  FROM pairs),
       |ranked AS (
       |  SELECT query_id, nbr_id, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank::BIGINT AS rank, nbr_id, cosine FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private val p08 = {
    val terms = (0 until LshPlanes).map { p =>
      val ws = (0 until EmbDim).map(d => planeWeight(p, d).toString).mkString(", ")
      s"CASE WHEN list_sum([x[1] * x[2] FOR x IN list_zip(q, [$ws])]) > 0 THEN ${1L << p}::BIGINT ELSE 0::BIGINT END"
    }.mkString("\n       + ")
    s"""$quantCte,
       |bk AS (SELECT vec_id, q, nrm, $terms AS bucket FROM n),
       |pairs AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS nbr_id, a.bucket AS bucket,
       |         list_sum([x[1] * x[2] FOR x IN list_zip(a.q, b.q)]) AS dot,
       |         a.nrm AS na, b.nrm AS nb
       |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
       |  WHERE a.vec_id < 10),
       |scored AS (
       |  SELECT query_id, nbr_id, bucket,
       |         CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine
       |  FROM pairs),
       |ranked AS (
       |  SELECT query_id, nbr_id, bucket, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank::BIGINT AS rank, nbr_id, bucket, cosine FROM ranked
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  private val p09 =
    """WITH t AS (
      |  SELECT event_type, user_id, value, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events)
      |SELECT event_type, count(*)::BIGINT AS n, count(DISTINCT user_id)::BIGINT AS n_users,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
      |       CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k,
      |       CAST(CAST(sum(k) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_k
      |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin

  private val p10 = {
    val scores = PipelineOps.LangMarkers.map { case (l, ms) =>
      s"len(list_filter(toks, t -> list_contains([${sqlList(ms)}], t)))::BIGINT AS score_$l"
    }.mkString(",\n         ")
    val best = PipelineOps.LangMarkers.map { case (l, _) => s"score_$l" }.mkString("greatest(", ", ", ")")
    val cases = PipelineOps.LangMarkers.map { case (l, _) =>
      s"WHEN score_$l = best AND best > 0 THEN '$l'"
    }.mkString(" ")
    s"""WITH t AS (
       |  SELECT lang, $scores
       |  FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)),
       |p AS (
       |  SELECT lang, CASE $cases ELSE 'und' END AS predicted
       |  FROM (SELECT lang, $best AS best, * FROM t))
       |SELECT lang, predicted, count(*)::BIGINT AS n FROM p
       |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
  }

  private val p11 =
    s"""WITH t AS (
       |  SELECT source, len(regexp_extract_all(text, '${PipelineOps.TokenRegex}'))::BIGINT AS n_bpe,
       |         len(string_split(text, ' '))::BIGINT AS n_ws
       |  FROM documents)
       |SELECT source, count(*)::BIGINT AS n_docs, CAST(sum(n_bpe) AS BIGINT) AS sum_bpe,
       |       CAST(sum(n_ws) AS BIGINT) AS sum_ws, max(n_bpe) AS max_bpe, min(n_bpe) AS min_bpe
       |FROM t GROUP BY source ORDER BY source""".stripMargin

  private val p12 =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         [ (${hex12("substr(text, i, 8)")})::BIGINT % $BaseHashMod FOR i IN range(1, len(text) - 6) ] AS kh
       |  FROM documents WHERE len(text) >= 11),
       |f AS (
       |  SELECT doc_id,
       |         list_distinct([ list_min(kh[i:i+3]) FOR i IN range(1, len(kh) - 2) ]) AS fps
       |  FROM t WHERE doc_id < 100)
       |SELECT doc_id, len(fps)::BIGINT AS n_fingerprints, list_min(fps) AS fp_min, list_max(fps) AS fp_max
       |FROM f ORDER BY doc_id""".stripMargin

  /** p13: the oracle never parses BMP/PNG/WAV bytes — it recomputes every
    * decoded statistic straight from the text formulas (pixel channel c of
    * logical pixel k reads text byte (3k+c) mod len; sample i is
    * ((byte(i mod len)*131 + 7i) mod 65536) - 32768), plus the exact
    * on-disk sizes from the format arithmetic (54 + h·pad4(3w) for BMP,
    * 63 + 5·⌈raw/65535⌉ + raw with raw = h·(1+3w) for PNG — computable
    * because the encoder emits stored deflate blocks — and 44 + 2n for
    * WAV). The Spark side must round-trip through real encode + real
    * parse (including a real zlib inflate for PNG) to land on the same
    * integers. */
  private val p13 =
    s"""WITH t AS (
       |  SELECT doc_id, source, text, n_chars, len(text) AS l,
       |         (doc_id % 2 = 0) AS is_img, (doc_id % 4 = 0) AS is_png,
       |         (n_chars % 12 + 1) AS iw, (doc_id % 9 + 1) AS ih,
       |         (doc_id % 3 * 1000 + 8000) AS rate, (n_chars % 100 + 64) AS ns
       |  FROM documents),
       |img AS (
       |  SELECT source, is_png, iw * ih AS n_px,
       |         CASE WHEN is_png
       |              THEN 63 + 5 * ((ih * (1 + 3 * iw) + 65534) // 65535) + ih * (1 + 3 * iw)
       |              ELSE 54 + ih * (((3 * iw + 3) // 4) * 4) END AS n_bytes,
       |         list_sum([ord(text[((3*k) % l)+1]) + ord(text[((3*k+1) % l)+1]) + ord(text[((3*k+2) % l)+1]) FOR k IN range(0, iw * ih)]) AS sum_rgb,
       |         list_sum([(k+1) * ord(text[((3*k) % l)+1]) FOR k IN range(0, iw * ih)]) AS wsum_b
       |  FROM t WHERE is_img),
       |aud AS (
       |  SELECT source, ns, 44 + 2 * ns AS n_bytes,
       |         (ns * 1000000) // rate AS dur,
       |         list_sum([abs(((ord(text[(i % l)+1]) * 131 + i*7) % 65536) - 32768) FOR i IN range(0, ns)]) AS sum_abs,
       |         list_max([abs(((ord(text[(i % l)+1]) * 131 + i*7) % 65536) - 32768) FOR i IN range(0, ns)]) AS max_abs,
       |         list_sum([(i+1) * (((ord(text[(i % l)+1]) * 131 + i*7) % 65536) - 32768) FOR i IN range(0, ns)]) AS wsum
       |  FROM t WHERE NOT is_img),
       |gi AS (SELECT source, count(*)::BIGINT AS n_images,
       |              CAST(sum(CASE WHEN is_png THEN 1 ELSE 0 END) AS BIGINT) AS n_png,
       |              CAST(sum(n_px) AS BIGINT) AS sum_pixels,
       |              CAST(sum(n_bytes) AS BIGINT) AS img_bytes, CAST(sum(sum_rgb) AS BIGINT) AS sum_rgb,
       |              CAST(sum(wsum_b) AS BIGINT) AS wsum_b
       |       FROM img GROUP BY source),
       |ga AS (SELECT source, count(*)::BIGINT AS n_audio, CAST(sum(ns) AS BIGINT) AS sum_samples,
       |              CAST(sum(dur) AS BIGINT) AS sum_duration_us, CAST(sum(n_bytes) AS BIGINT) AS aud_bytes,
       |              CAST(sum(sum_abs) AS BIGINT) AS sum_abs, CAST(max(max_abs) AS BIGINT) AS max_abs,
       |              CAST(sum(wsum) AS BIGINT) AS wsum_audio
       |       FROM aud GROUP BY source),
       |n AS (SELECT source, count(*)::BIGINT AS n_assets FROM t GROUP BY source)
       |SELECT n.source, n.n_assets,
       |       COALESCE(gi.img_bytes, 0) + COALESCE(ga.aud_bytes, 0) AS sum_bytes,
       |       COALESCE(gi.n_images, 0) AS n_images, COALESCE(gi.n_png, 0) AS n_png,
       |       COALESCE(gi.sum_pixels, 0) AS sum_pixels,
       |       COALESCE(gi.sum_rgb, 0) AS sum_rgb, COALESCE(gi.wsum_b, 0) AS wsum_b,
       |       COALESCE(ga.n_audio, 0) AS n_audio, COALESCE(ga.sum_samples, 0) AS sum_samples,
       |       COALESCE(ga.sum_duration_us, 0) AS sum_duration_us,
       |       COALESCE(ga.sum_abs, 0) AS sum_abs, COALESCE(ga.max_abs, 0) AS max_abs,
       |       COALESCE(ga.wsum_audio, 0) AS wsum_audio
       |FROM n LEFT JOIN gi ON gi.source = n.source LEFT JOIN ga ON ga.source = n.source
       |ORDER BY n.source""".stripMargin

  private val p14 = {
    // adaptive bits-per-band: smallest k with 2^k * target >= n (clamped) —
    // ceil(log2(n/target)), exactly PipelineOps.dedupBits
    val nbitsSql =
      s"least(${PipelineOps.DedupMaxBits}, greatest(${PipelineOps.DedupMinBits}, " +
        s"CAST(ceil(log2(count(*) / ${PipelineOps.DedupTargetBucket}.0)) AS INT)))"
    // one banded signature per band: bit i contributes 2^i iff i < nbits and
    // the band's plane-i dot is positive (the guard makes the static SQL
    // adaptive to the corpus size the same way the Spark side is)
    val bandSelects = (0 until PipelineOps.DedupBands).map { b =>
      val terms = (0 until PipelineOps.DedupMaxBits).map { i =>
        val ws = (0 until EmbDim).map(d => planeWeight(PipelineOps.dedupPlaneIdx(b, i), d).toString).mkString(", ")
        s"CASE WHEN $i < p.nbits AND list_sum([x[1] * x[2] FOR x IN list_zip(q, [$ws])]) > 0 THEN ${1L << i}::BIGINT ELSE 0::BIGINT END"
      }.mkString("\n       + ")
      s"SELECT vec_id, ${b}::BIGINT AS band, $terms AS bkey FROM n CROSS JOIN p"
    }.mkString("\n UNION ALL\n")
    s"""$quantCte,
       |p AS (SELECT $nbitsSql AS nbits FROM embeddings),
       |banded AS ($bandSelects),
       |capped AS (
       |  SELECT vec_id, band, bkey FROM (
       |    SELECT vec_id, band, bkey, count(*) OVER (PARTITION BY band, bkey) AS cnt FROM banded)
       |  WHERE cnt <= ${Hashing.MaxBucketSize}),
       |cand AS (
       |  SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
       |  FROM capped l JOIN capped r
       |    ON l.band = r.band AND l.bkey = r.bkey AND l.vec_id < r.vec_id),
       |pairs AS (
       |  SELECT cand.vec_a, cand.vec_b,
       |         CAST(list_sum([x[1] * x[2] FOR x IN list_zip(a.q, b.q)]) AS DOUBLE)
       |           / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) AS cosine
       |  FROM cand JOIN n a ON a.vec_id = cand.vec_a JOIN n b ON b.vec_id = cand.vec_b)
       |SELECT vec_a, vec_b, cosine FROM pairs
       |WHERE cosine >= ${PipelineOps.EmbDupThreshold}
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  private val p15 =
    s"""$quantCte,
       |cents AS (SELECT vec_id AS cid, q AS qc, nrm AS nc FROM n WHERE vec_id < ${PipelineOps.IvfCentroids} AND nrm > 0),
       |cranked AS (
       |  SELECT n.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |           CAST(list_sum([x[1] * x[2] FOR x IN list_zip(n.q, c.qc)]) AS DOUBLE)
       |             / (sqrt(CAST(n.nrm AS DOUBLE)) * sqrt(CAST(c.nc AS DOUBLE))) DESC, c.cid ASC) AS crn
       |  FROM n CROSS JOIN cents c),
       |assigned AS (SELECT vec_id AS nbr_id, cid FROM cranked WHERE crn = 1),
       |probes AS (SELECT vec_id AS query_id, cid FROM cranked WHERE crn <= ${PipelineOps.IvfProbes} AND vec_id < 10),
       |cand AS (
       |  SELECT p.query_id, a.nbr_id FROM probes p JOIN assigned a ON p.cid = a.cid
       |  WHERE a.nbr_id <> p.query_id),
       |scored AS (
       |  SELECT cand.query_id, cand.nbr_id,
       |         CAST(list_sum([x[1] * x[2] FOR x IN list_zip(qa.q, qb.q)]) AS DOUBLE)
       |           / (sqrt(CAST(qa.nrm AS DOUBLE)) * sqrt(CAST(qb.nrm AS DOUBLE))) AS cosine
       |  FROM cand JOIN n qa ON qa.vec_id = cand.query_id JOIN n qb ON qb.vec_id = cand.nbr_id),
       |ranked AS (
       |  SELECT query_id, nbr_id, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank::BIGINT AS rank, nbr_id, cosine FROM ranked
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  private val p16 =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsn FROM events),
       |l AS (
       |  SELECT user_id, event_id, tsn,
       |         lag(tsn) OVER (PARTITION BY user_id ORDER BY tsn, event_id) AS prev
       |  FROM e),
       |w AS (
       |  SELECT user_id, event_id, tsn,
       |         CASE WHEN prev IS NULL OR tsn - prev > ${PipelineOps.SessionGapUs} THEN 1 ELSE 0 END AS new_s
       |  FROM l),
       |s AS (
       |  SELECT user_id, tsn,
       |         sum(new_s) OVER (PARTITION BY user_id ORDER BY tsn, event_id) AS session_id
       |  FROM w),
       |g AS (
       |  SELECT user_id, session_id, count(*)::BIGINT AS n_events,
       |         (max(tsn) - min(tsn))::BIGINT AS duration_us
       |  FROM s GROUP BY user_id, session_id)
       |SELECT n_events, count(*)::BIGINT AS n_sessions, CAST(sum(duration_us) AS BIGINT) AS sum_duration_us
       |FROM g GROUP BY n_events ORDER BY n_events""".stripMargin

  private val p17 =
    s"""WITH toks AS (
       |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM documents),
       |freqs AS (SELECT tok, count(*)::BIGINT AS freq FROM toks GROUP BY tok)
       |SELECT source, count(*)::BIGINT AS n_tokens,
       |       CAST(sum(CASE WHEN freq < ${PipelineOps.RareTokenThreshold} THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       |       count(DISTINCT CASE WHEN freq < ${PipelineOps.RareTokenThreshold} THEN tok END)::BIGINT AS n_rare_types,
       |       CAST(CAST(sum(CASE WHEN freq < ${PipelineOps.RareTokenThreshold} THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS rare_ratio
       |FROM toks JOIN freqs USING (tok)
       |GROUP BY source ORDER BY source""".stripMargin

  private val p18 =
    s"""WITH t AS (
       |  SELECT doc_id, lang, n_chars, ${hex12("doc_id::VARCHAR")} % 100 AS bucket
       |  FROM documents),
       |s AS (
       |  SELECT *, CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split
       |  FROM t)
       |SELECT split, count(*)::BIGINT AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |       count(DISTINCT lang)::BIGINT AS n_langs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |FROM s GROUP BY split ORDER BY split""".stripMargin

  private val p19 =
    s"""$shingleCtes,
       |probe AS (
       |  SELECT DISTINCT unnest(hashes) AS h FROM h WHERE doc_id < ${PipelineOps.ContaminationProbeDocs}),
       |corpus AS (
       |  SELECT doc_id, len(hashes)::BIGINT AS n_grams, unnest(hashes) AS h
       |  FROM h WHERE doc_id >= ${PipelineOps.ContaminationProbeDocs}),
       |hits AS (
       |  SELECT doc_id, n_grams, count(*)::BIGINT AS n_hits
       |  FROM corpus JOIN probe USING (h) GROUP BY doc_id, n_grams)
       |SELECT doc_id, n_hits, n_grams, CAST(n_hits AS DOUBLE) / CAST(n_grams AS DOUBLE) AS overlap
       |FROM hits WHERE n_hits * ${PipelineOps.ContaminationDen} >= n_grams * ${PipelineOps.ContaminationNum}
       |ORDER BY doc_id""".stripMargin

  private val p20 =
    """WITH t AS (
      |  SELECT source, toks, len(toks)::BIGINT AS n_toks,
      |         len(list_distinct(toks))::BIGINT AS n_utoks,
      |         [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))] AS grams
      |  FROM (SELECT source, string_split(text, ' ') AS toks FROM documents)
      |  WHERE len(toks) >= 2),
      |g AS (
      |  SELECT source, n_toks, n_utoks, len(grams)::BIGINT AS n_grams,
      |         len(list_distinct(grams))::BIGINT AS n_ugrams
      |  FROM t)
      |SELECT source, count(*)::BIGINT AS n_docs,
      |       CAST(sum(n_toks) AS BIGINT) AS sum_toks,
      |       CAST(sum(n_toks - n_utoks) AS BIGINT) AS dup_toks,
      |       CAST(sum(n_grams) AS BIGINT) AS sum_grams,
      |       CAST(sum(n_grams - n_ugrams) AS BIGINT) AS dup_grams,
      |       CAST(sum(CASE WHEN (n_grams - n_ugrams) * 5 > n_grams THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |       CAST(CAST(sum(n_toks - n_utoks) AS BIGINT) AS DOUBLE) / CAST(CAST(sum(n_toks) AS BIGINT) AS DOUBLE) AS dup_tok_ratio,
      |       CAST(CAST(sum(n_grams - n_ugrams) AS BIGINT) AS DOUBLE) / CAST(CAST(sum(n_grams) AS BIGINT) AS DOUBLE) AS dup_gram_ratio
      |FROM g GROUP BY source ORDER BY source""".stripMargin

  private val p21 = {
    val C = PipelineOps.CtxLen
    s"""WITH t AS (SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS n_toks FROM documents),
       |c AS (
       |  SELECT source, doc_id, n_toks,
       |         coalesce(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
       |  FROM t)
       |SELECT source, count(*)::BIGINT AS n_docs, CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
       |       ((CAST(sum(n_toks) AS BIGINT) + ${C - 1}) // $C)::BIGINT AS n_windows,
       |       CAST(sum(CASE WHEN (cum_before + n_toks - 1) // $C > cum_before // $C THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
       |       max(n_toks) AS max_doc_tokens,
       |       CAST(CAST(sum(n_toks) AS BIGINT) AS DOUBLE)
       |         / CAST(((CAST(sum(n_toks) AS BIGINT) + ${C - 1}) // $C) * $C AS DOUBLE) AS fill_ratio
       |FROM c GROUP BY source ORDER BY source""".stripMargin
  }

  private val p22 =
    s"""WITH t AS (
       |  SELECT source, doc_id, n_chars,
       |         CAST(regexp_extract(source, 'src([0-9]+)', 1) AS BIGINT) AS sidx,
       |         ${hex12("source || ':' || doc_id::VARCHAR")} % 100 AS bucket
       |  FROM documents),
       |r AS (SELECT *, ${PipelineOps.MixBase} + ${PipelineOps.MixStep} * (sidx % ${PipelineOps.MixMod}) AS rate_pct FROM t)
       |SELECT source, rate_pct, count(*)::BIGINT AS n_docs,
       |       CAST(sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(CASE WHEN bucket < rate_pct THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
       |       CAST(CAST(sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS achieved
       |FROM r GROUP BY source, rate_pct ORDER BY source""".stripMargin

  /** Transitive closure via recursive CTE — the set-semantics UNION makes the
    * iteration terminate; cluster id is the min reachable node, matching the
    * Spark side's min-label-propagation fixpoint. */
  private val p23 =
    s"""WITH RECURSIVE g AS (
       |  SELECT doc_id, lang, source, CAST(floor(n_chars / 100.0) AS BIGINT) AS block,
       |         list_distinct([ (${hex12("substr(text, i, 3)")})::BIGINT FOR i IN range(1, len(text) - 1) ]) AS grams
       |  FROM documents WHERE len(text) >= 3),
       |j AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         len(list_intersect(a.grams, b.grams))::BIGINT AS inter,
       |         len(a.grams)::BIGINT AS ca, len(b.grams)::BIGINT AS cb
       |  FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.block = b.block AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT doc_a, doc_b FROM j
       |  WHERE CAST(inter AS DOUBLE) / CAST(ca + cb - inter AS DOUBLE) >= 0.6),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
       |r AS (
       |  SELECT a AS d, a AS reach FROM e
       |  UNION
       |  SELECT r.d, e.b AS reach FROM r JOIN e ON r.reach = e.a),
       |cl AS (SELECT d, min(reach) AS cluster_id FROM r GROUP BY d)
       |SELECT cluster_id, count(*)::BIGINT AS n_members, max(d) AS max_doc
       |FROM cl GROUP BY cluster_id ORDER BY cluster_id""".stripMargin

  /** p36's CTE chain over an arbitrary documents-shaped relation — shared
    * with p61, whose oracle is exactly this body over the derived
    * new-snapshot relation (the delta-maintained state must converge to
    * the one-shot verdict of the new corpus). */
  private def p36Body(src: String) =
    s"""ex AS (
       |  SELECT doc_id, text, lang, source, n_chars,
       |         min(doc_id) OVER (PARTITION BY md5(text)) AS canon
       |  FROM $src),
       |surv AS (SELECT * FROM ex WHERE doc_id = canon),
       |g AS (
       |  SELECT doc_id, lang, source, CAST(floor(n_chars / 100.0) AS BIGINT) AS block,
       |         list_distinct([ (${hex12("substr(text, i, 3)")})::BIGINT FOR i IN range(1, len(text) - 1) ]) AS grams
       |  FROM surv WHERE len(text) >= 3),
       |j AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         len(list_intersect(a.grams, b.grams))::BIGINT AS inter,
       |         len(a.grams)::BIGINT AS ca, len(b.grams)::BIGINT AS cb
       |  FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.block = b.block AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT doc_a, doc_b FROM j
       |  WHERE CAST(inter AS DOUBLE) / CAST(ca + cb - inter AS DOUBLE) >= 0.6),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
       |r AS (
       |  SELECT a AS d, a AS reach FROM e
       |  UNION
       |  SELECT r.d, e.b AS reach FROM r JOIN e ON r.reach = e.a),
       |cl AS (SELECT d, min(reach) AS cluster_id FROM r GROUP BY d),
       |scl AS (
       |  SELECT surv.doc_id AS sid, coalesce(cl.cluster_id, surv.doc_id) AS scanon
       |  FROM surv LEFT JOIN cl ON cl.d = surv.doc_id)
       |SELECT ex.doc_id,
       |       CASE WHEN ex.doc_id <> ex.canon THEN 'exact'
       |            WHEN cl.cluster_id IS NOT NULL AND cl.cluster_id <> ex.doc_id THEN 'near'
       |            ELSE 'kept' END AS reason,
       |       CASE WHEN ex.doc_id <> ex.canon THEN scl.scanon
       |            WHEN cl.cluster_id IS NOT NULL THEN cl.cluster_id
       |            ELSE ex.doc_id END AS canonical_id
       |FROM ex JOIN scl ON scl.sid = ex.canon LEFT JOIN cl ON cl.d = ex.doc_id
       |ORDER BY ex.doc_id""".stripMargin

  private val p36 = s"WITH RECURSIVE ${p36Body("documents")}"

  /** p61: the one-shot p36 semantics over p59's derived NEW snapshot —
    * the delta-maintained incremental state must answer as if the new
    * corpus had been dedup'd from scratch. */
  private val p61 =
    s"""WITH RECURSIVE newsnap AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 7 = 3 THEN text || ' rev2' ELSE text END AS text,
       |         lang, source,
       |         len(CASE WHEN doc_id % 7 = 3 THEN text || ' rev2' ELSE text END)::BIGINT AS n_chars
       |  FROM documents WHERE doc_id % 10 <> 0),
       |${p36Body("newsnap")}""".stripMargin

  /** p71: the one-shot p36 semantics over the CHAIN's final snapshot S2
    * (docs % 10 <> 1, `%7=3` docs carrying ' rev2', `%13=4` docs
    * additionally carrying ' rev3') — two consecutive maintained bumps
    * through durable state must answer as a from-scratch dedup of S2. */
  private val p71 =
    s"""WITH RECURSIVE b1 AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 7 = 3 THEN text || ' rev2' ELSE text END AS t2,
       |         lang, source
       |  FROM documents WHERE doc_id % 10 <> 1),
       |newsnap AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 13 = 4 THEN t2 || ' rev3' ELSE t2 END AS text,
       |         lang, source,
       |         len(CASE WHEN doc_id % 13 = 4 THEN t2 || ' rev3' ELSE t2 END)::BIGINT AS n_chars
       |  FROM b1),
       |${p36Body("newsnap")}""".stripMargin

  /** `//` (DuckDB) and `DIV` (Spark) both truncate toward zero on BIGINT, so
    * the integer-mean centroids are bit-identical cross-engine. */
  private val p24 = {
    val K = PipelineOps.IvfCentroids
    s"""$quantCte,
       |cents AS (SELECT vec_id AS cid, q AS qc, nrm AS nc FROM n WHERE vec_id < $K AND nrm > 0),
       |cr0 AS (
       |  SELECT n.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |           CAST(list_sum([x[1] * x[2] FOR x IN list_zip(n.q, c.qc)]) AS DOUBLE)
       |             / (sqrt(CAST(n.nrm AS DOUBLE)) * sqrt(CAST(c.nc AS DOUBLE))) DESC, c.cid ASC) AS crn
       |  FROM n CROSS JOIN cents c),
       |a0 AS (SELECT vec_id, cid FROM cr0 WHERE crn = 1),
       |counts AS (SELECT cid, count(*)::BIGINT AS cnt FROM a0 GROUP BY cid),
       |sums AS (
       |  SELECT a0.cid, i.i, CAST(sum(n.q[i.i]) AS BIGINT) AS s
       |  FROM a0 JOIN n USING (vec_id) CROSS JOIN (SELECT unnest(range(1, ${EmbDim + 1})) AS i) i
       |  GROUP BY a0.cid, i.i),
       |newc AS (
       |  SELECT sums.cid, list(s // cnt ORDER BY i) AS qm FROM sums JOIN counts USING (cid)
       |  GROUP BY sums.cid, cnt),
       |nc2 AS (SELECT cid, qm, list_sum([x[1] * x[2] FOR x IN list_zip(qm, qm)]) AS nm FROM newc WHERE list_sum([x[1] * x[2] FOR x IN list_zip(qm, qm)]) > 0),
       |cr1 AS (
       |  SELECT n.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |           CAST(list_sum([x[1] * x[2] FOR x IN list_zip(n.q, c.qm)]) AS DOUBLE)
       |             / (sqrt(CAST(n.nrm AS DOUBLE)) * sqrt(CAST(c.nm AS DOUBLE))) DESC, c.cid ASC) AS crn
       |  FROM n CROSS JOIN nc2 c),
       |a1 AS (SELECT vec_id, cid FROM cr1 WHERE crn = 1),
       |moved AS (
       |  SELECT a0.cid, count(*)::BIGINT AS n_moved_out
       |  FROM a0 JOIN a1 USING (vec_id) WHERE a0.cid <> a1.cid GROUP BY a0.cid),
       |after AS (SELECT cid, count(*)::BIGINT AS n_after FROM a1 GROUP BY cid)
       |SELECT c.cid, counts.cnt AS n_before,
       |       coalesce(after.n_after, 0)::BIGINT AS n_after,
       |       coalesce(moved.n_moved_out, 0)::BIGINT AS n_moved_out
       |FROM cents c
       |LEFT JOIN counts ON counts.cid = c.cid
       |LEFT JOIN after ON after.cid = c.cid
       |LEFT JOIN moved ON moved.cid = c.cid
       |ORDER BY c.cid""".stripMargin
  }

  /** p25: the as-of join expressed as ANSI window SQL — the running max of
    * view timestamps in (ts, side, id) order is exactly the union+last
    * merge-scan the Spark operator performs (views sort before clicks at
    * equal ts: inclusive semantics). */
  private val p25 =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tsu,
      |         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS tag
      |  FROM events WHERE event_type IN ('view', 'click')),
      |u AS (
      |  SELECT user_id, event_id, tsu, tag,
      |         max(CASE WHEN tag = 0 THEN tsu END)
      |           OVER (PARTITION BY user_id ORDER BY tsu, tag, event_id
      |                 ROWS UNBOUNDED PRECEDING) AS vts
      |  FROM e)
      |SELECT user_id,
      |       count(*)::BIGINT AS n_clicks,
      |       CAST(sum(CASE WHEN vts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
      |       coalesce(CAST(sum(tsu - vts) AS BIGINT), 0) AS sum_lag_us,
      |       coalesce(CAST(max(tsu - vts) AS BIGINT), 0) AS max_lag_us
      |FROM u WHERE tag = 1 GROUP BY user_id ORDER BY user_id""".stripMargin

  /** p26: the interval join as a plain inequality join (the oracle can
    * afford the per-key cross product the Spark side buckets away). */
  private val p26 =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, value, event_type FROM events),
       |p AS (SELECT user_id, event_id AS purchase_id, tsu FROM e WHERE event_type = 'purchase'),
       |v AS (SELECT user_id, event_id AS view_id, tsu, value FROM e WHERE event_type = 'view'),
       |m AS (
       |  SELECT p.user_id, p.purchase_id,
       |         count(v.view_id)::BIGINT AS nv,
       |         sum(CAST(v.value AS DECIMAL(18,6))) AS sv
       |  FROM p LEFT JOIN v
       |    ON v.user_id = p.user_id
       |   AND v.tsu >= p.tsu - ${PipelineOps.AttribWindowUs}
       |   AND v.tsu <= p.tsu
       |  GROUP BY p.user_id, p.purchase_id)
       |SELECT user_id,
       |       count(*)::BIGINT AS n_purchases,
       |       CAST(sum(nv) AS BIGINT) AS n_attr_views,
       |       coalesce(CAST(CAST(sum(sv) AS VARCHAR) AS DOUBLE), 0.0) AS attr_value
       |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin

  /** p27: BPE pair counting — word-frequency rollup then weighted char-pair
    * expansion, identical two-level shape to the Spark plan. */
  private val p27 =
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |words AS (SELECT w, count(*)::BIGINT AS wc FROM toks WHERE len(w) >= 2 GROUP BY w),
       |pairs AS (SELECT unnest([substr(w, i, 2) FOR i IN range(1, len(w))]) AS pair, wc FROM words),
       |agg AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS freq FROM pairs GROUP BY pair)
       |SELECT pair, freq FROM agg ORDER BY freq DESC, pair ASC LIMIT ${PipelineOps.BpeTopK}""".stripMargin

  /** p28: per-frame BMP stats recomputed from the text formulas (frame f
    * uses pixel seed 11f), signature arithmetic identical to the Spark
    * side's decoded-value expression — never parses bytes. */
  private val p28 =
    s"""WITH t AS (
       |  SELECT doc_id AS asset_id, source, text, n_chars, len(text) AS l,
       |         (n_chars % 6 + 2) AS nf
       |  FROM documents),
       |fr AS (
       |  SELECT asset_id, source, text, l, n_chars, unnest(range(0, nf)) AS f FROM t),
       |dims AS (
       |  SELECT asset_id, source, text, l, f,
       |         ((asset_id + f) % 5 + 3) AS fw, ((n_chars + f) % 4 + 2) AS fh
       |  FROM fr),
       |d AS (
       |  SELECT asset_id, source, fw * fh AS n_px,
       |         list_sum([ord(text[((11*f + 3*k) % l)+1]) FOR k IN range(0, fw * fh)]) AS sum_b,
       |         list_sum([ord(text[((11*f + 3*k + 2) % l)+1]) FOR k IN range(0, fw * fh)]) AS sum_r,
       |         list_sum([(k+1) * ord(text[((11*f + 3*k) % l)+1]) FOR k IN range(0, fw * fh)]) AS wsum_b
       |  FROM dims),
       |s AS (
       |  SELECT asset_id, source, n_px,
       |         sum_b * 1000003 + wsum_b * 31 + sum_r AS sig
       |  FROM d),
       |a AS (
       |  SELECT asset_id, source, count(*)::BIGINT AS n_frames,
       |         count(DISTINCT sig)::BIGINT AS n_unique_frames,
       |         CAST(sum(n_px) AS BIGINT) AS asset_pixels, min(sig) AS min_sig
       |  FROM s GROUP BY asset_id, source)
       |SELECT source, count(*)::BIGINT AS n_assets,
       |       CAST(sum(n_frames) AS BIGINT) AS sum_frames,
       |       CAST(sum(n_unique_frames) AS BIGINT) AS sum_unique,
       |       CAST(sum(asset_pixels) AS BIGINT) AS sum_pixels,
       |       CAST(min(min_sig) AS BIGINT) AS corpus_min_sig
       |FROM a GROUP BY source ORDER BY source""".stripMargin

  /** p29: relational KMV — distinct hashes, k smallest per group, unbiased
    * (k-1)·2^48/h_(k) estimate; integer inputs keep the double math exact
    * cross-engine. */
  private val p29 = {
    val k = PipelineOps.KmvK
    s"""WITH d AS (
       |  SELECT DISTINCT event_type, ${hex12("CAST(user_id AS VARCHAR)")} AS h FROM events),
       |r AS (
       |  SELECT event_type, h,
       |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM d)
       |SELECT event_type,
       |       count(*)::BIGINT AS n_exact,
       |       CAST(sum(CASE WHEN rn <= $k THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(max(CASE WHEN rn <= $k THEN h END) AS BIGINT) AS kth,
       |       CASE WHEN CAST(sum(CASE WHEN rn <= $k THEN 1 ELSE 0 END) AS BIGINT) < $k
       |            THEN CAST(CAST(sum(CASE WHEN rn <= $k THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
       |            ELSE CAST(${k - 1} AS DOUBLE) * CAST(281474976710656 AS DOUBLE) / CAST(max(CASE WHEN rn <= $k THEN h END) AS DOUBLE)
       |       END AS est
       |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** p30: every SpanLen-token window counted corpus-wide; DuckDB's 1-based
    * inclusive list slice `toks[i:i+4]` is Spark's 0-based
    * `toks[i..i+SpanLen-1]`. */
  private val p30 = {
    val len = PipelineOps.SpanLen
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (
       |  SELECT doc_id,
       |         unnest([array_to_string(toks[i:i+${len - 1}], ' ') FOR i IN range(1, len(toks) - ${len - 2})]) AS span
       |  FROM t WHERE len(toks) >= $len),
       |sh AS (SELECT doc_id, span, ${hex63("span")} AS h FROM s),
       |c AS (
       |  SELECT h, count(*)::BIGINT AS freq, count(DISTINCT doc_id)::BIGINT AS n_docs
       |  FROM sh GROUP BY h HAVING count(*) >= 2),
       |top AS (SELECT * FROM c ORDER BY freq DESC, h ASC LIMIT ${PipelineOps.SpanTopK}),
       |j AS (
       |  SELECT top.freq, top.n_docs, min(sh.span) AS span
       |  FROM top JOIN sh USING (h) GROUP BY top.h, top.freq, top.n_docs)
       |SELECT span, freq, n_docs FROM j ORDER BY freq DESC, span ASC""".stripMargin
  }

  /** p31: integer-quotient idf — BIGINT `//` in DuckDB is Spark's `DIV`,
    * so the score is the identical int64 on both sides. */
  private val p31 = {
    val scale = PipelineOps.TfIdfScale
    s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, tok),
       |dfq AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok),
       |n AS (SELECT count(*)::BIGINT AS n_corpus FROM documents),
       |sc AS (
       |  SELECT t.doc_id, t.tok, t.tf, d.df,
       |         CAST(t.tf * ((n.n_corpus * $scale) // d.df) AS BIGINT) AS score
       |  FROM tf t JOIN dfq d USING (tok) CROSS JOIN n
       |  WHERE t.doc_id < ${PipelineOps.TfIdfDocs}),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rnk
       |  FROM sc)
       |SELECT doc_id, CAST(rnk AS BIGINT) AS "rank", tok, tf, df, score
       |FROM r WHERE rnk <= ${PipelineOps.TfIdfTopK} ORDER BY doc_id, rnk""".stripMargin
  }

  /** p32: quota-many lowest-hash docs per (lang, source) stratum. */
  private val p32 = {
    val rate = PipelineOps.StratRatePct
    s"""WITH t AS (
       |  SELECT lang, source, doc_id, n_chars,
       |         ${hex12("lang || '|' || source || '|' || CAST(doc_id AS VARCHAR)")} AS h
       |  FROM documents),
       |r AS (
       |  SELECT lang, source, doc_id, n_chars,
       |         row_number() OVER (PARTITION BY lang, source ORDER BY h ASC, doc_id ASC) AS rn,
       |         (count(*) OVER (PARTITION BY lang, source) * $rate + 99) // 100 AS quota
       |  FROM t)
       |SELECT lang, source, count(*)::BIGINT AS n_docs,
       |       CAST(sum(CASE WHEN rn <= quota THEN 1 ELSE 0 END) AS BIGINT) AS n_sample,
       |       CAST(sum(CASE WHEN rn <= quota THEN doc_id ELSE 0 END) AS BIGINT) AS sample_id_sum,
       |       CAST(sum(CASE WHEN rn <= quota THEN n_chars ELSE 0 END) AS BIGINT) AS sample_chars
       |FROM r GROUP BY lang, source ORDER BY lang, source""".stripMargin
  }

  /** p33: three stage aggregates chained by at-or-after joins; lags are
    * exact integer microseconds (epoch_us == Spark's nanos DIV 1000). */
  private val p33 =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
      |v AS (SELECT user_id, min(tsu) AS v_ts FROM e WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.tsu) AS c_ts
      |  FROM e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.tsu >= v.v_ts GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.tsu) AS p_ts
      |  FROM e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.tsu >= c.c_ts GROUP BY e.user_id),
      |s AS (
      |  SELECT v.user_id, v.v_ts, c.c_ts, p.p_ts,
      |         CASE WHEN p.p_ts IS NOT NULL THEN 3 WHEN c.c_ts IS NOT NULL THEN 2 ELSE 1 END AS stage
      |  FROM v LEFT JOIN c ON v.user_id = c.user_id LEFT JOIN p ON v.user_id = p.user_id)
      |SELECT CAST(stage AS BIGINT) AS stage, count(*)::BIGINT AS n_users,
      |       CAST(coalesce(sum(c_ts - v_ts), 0) AS BIGINT) AS sum_v2c_us,
      |       CAST(coalesce(sum(p_ts - c_ts), 0) AS BIGINT) AS sum_c2p_us
      |FROM s GROUP BY stage ORDER BY stage""".stripMargin

  /** p34: PQ encode + ADC scoring — DuckDB's 1-based inclusive slice
    * `q[a:b]` mirrors Spark's `slice(q, a, len)`; distances are exact int64
    * on both sides so ranks can't flap. */
  private val p34 = {
    val m = PipelineOps.PqSubspaces
    val d = Hashing.EmbDim / m
    s"""$quantCte,
       |mm AS (SELECT unnest(range(0, $m)) AS m),
       |sub AS (SELECT vec_id, m, q[(m*$d+1)::INT:(m*$d+$d)::INT] AS sub FROM n CROSS JOIN mm),
       |cents AS (SELECT vec_id AS cid, m, sub AS subc FROM sub WHERE vec_id < ${PipelineOps.PqCentroids}),
       |dists AS (
       |  SELECT s.vec_id, s.m, c.cid,
       |         CAST(list_sum([(x[1]-x[2])*(x[1]-x[2]) FOR x IN list_zip(s.sub, c.subc)]) AS BIGINT) AS dist
       |  FROM sub s JOIN cents c ON s.m = c.m),
       |codes AS (
       |  SELECT vec_id AS nbr_id, m, cid FROM (
       |    SELECT vec_id, m, cid,
       |           row_number() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, cid ASC) AS rn
       |    FROM dists) WHERE rn = 1),
       |adc AS (SELECT vec_id AS query_id, m, cid, dist AS qdist FROM dists WHERE vec_id < 10),
       |approx AS (
       |  SELECT a.query_id, c.nbr_id, CAST(sum(a.qdist) AS BIGINT) AS adist
       |  FROM codes c JOIN adc a ON c.m = a.m AND c.cid = a.cid
       |  WHERE a.query_id <> c.nbr_id
       |  GROUP BY a.query_id, c.nbr_id),
       |ranked AS (
       |  SELECT query_id, nbr_id, adist,
       |         row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, nbr_id ASC) AS rnk
       |  FROM approx)
       |SELECT query_id, CAST(rnk AS BIGINT) AS "rank", nbr_id, adist
       |FROM ranked WHERE rnk <= ${PipelineOps.PqTopK} ORDER BY query_id, rnk""".stripMargin
  }

  /** p37: composed IVF→PQ (IVFADC) — p15's coarse routing CTEs feeding
    * p34's encode/ADC CTEs; candidates restricted to probed cells before
    * any ADC scoring. Same exact-int64 distances, so ranks can't flap. */
  /** p37's CTE chain over an arbitrary embeddings-shaped relation —
    * shared with p63, whose oracle is this body over the derived
    * new-snapshot relation (seed ids < max(IvfCentroids, PqCentroids) and
    * the query set are preserved by the carving, so the frozen quantizer
    * equals the one a from-scratch build would train). */
  private def p37Sql(embSrc: String): String = {
    val m = PipelineOps.PqSubspaces
    val d = Hashing.EmbDim / m
    s"""qz AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QuantScale) AS BIGINT)) AS q
       |  FROM $embSrc),
       |n AS (SELECT vec_id, q, list_sum([x[1] * x[2] FOR x IN list_zip(q, q)]) AS nrm FROM qz),
       |cents AS (SELECT vec_id AS ccid, q AS qc, nrm AS nc FROM n WHERE vec_id < ${PipelineOps.IvfCentroids} AND nrm > 0),
       |cranked AS (
       |  SELECT n.vec_id, c.ccid,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |           CAST(list_sum([x[1] * x[2] FOR x IN list_zip(n.q, c.qc)]) AS DOUBLE)
       |             / (sqrt(CAST(n.nrm AS DOUBLE)) * sqrt(CAST(c.nc AS DOUBLE))) DESC, c.ccid ASC) AS crn
       |  FROM n CROSS JOIN cents c),
       |assigned AS (SELECT vec_id AS nbr_id, ccid FROM cranked WHERE crn = 1),
       |probes AS (SELECT vec_id AS query_id, ccid FROM cranked WHERE crn <= ${PipelineOps.IvfProbes} AND vec_id < 10),
       |mm AS (SELECT unnest(range(0, $m)) AS m),
       |sub AS (SELECT vec_id, m, q[(m*$d+1)::INT:(m*$d+$d)::INT] AS sub FROM n CROSS JOIN mm),
       |pcents AS (SELECT vec_id AS cid, m, sub AS subc FROM sub WHERE vec_id < ${PipelineOps.PqCentroids}),
       |dists AS (
       |  SELECT s.vec_id, s.m, c.cid,
       |         CAST(list_sum([(x[1]-x[2])*(x[1]-x[2]) FOR x IN list_zip(s.sub, c.subc)]) AS BIGINT) AS dist
       |  FROM sub s JOIN pcents c ON s.m = c.m),
       |codes AS (
       |  SELECT vec_id AS nbr_id, m, cid FROM (
       |    SELECT vec_id, m, cid,
       |           row_number() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, cid ASC) AS rn
       |    FROM dists) WHERE rn = 1),
       |adc AS (SELECT vec_id AS query_id, m, cid, dist AS qdist FROM dists WHERE vec_id < 10),
       |cand AS (
       |  SELECT p.query_id, a.nbr_id FROM probes p JOIN assigned a USING (ccid)
       |  WHERE a.nbr_id <> p.query_id),
       |approx AS (
       |  SELECT cand.query_id, c.nbr_id, CAST(sum(a.qdist) AS BIGINT) AS adist
       |  FROM cand JOIN codes c ON c.nbr_id = cand.nbr_id
       |           JOIN adc a ON a.query_id = cand.query_id AND a.m = c.m AND a.cid = c.cid
       |  GROUP BY cand.query_id, c.nbr_id),
       |ranked AS (
       |  SELECT query_id, nbr_id, adist,
       |         row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, nbr_id ASC) AS rnk
       |  FROM approx)
       |SELECT query_id, CAST(rnk AS BIGINT) AS "rank", nbr_id, adist
       |FROM ranked WHERE rnk <= ${PipelineOps.PqTopK} ORDER BY query_id, rnk""".stripMargin
  }

  private val p37 = s"WITH ${p37Sql("embeddings")}"

  /** p63: one-shot p37 semantics over the derived NEW embedding snapshot
    * (tombstoned old index + frozen-quantizer appends must answer as a
    * from-scratch build on the new corpus). */
  private val p63 = {
    val seedBound = math.max(PipelineOps.IvfCentroids, PipelineOps.PqCentroids).max(10)
    s"""WITH newemb AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id < $seedBound OR vec_id % 10 <> 0),
       |${p37Sql("newemb")}""".stripMargin
  }

  /** p64: positions ride DuckDB's zipped parallel unnest (the range list
    * and the hash-comprehension list have equal lengths); the islands
    * merge is the textbook gaps-and-islands window pair, frames pinned to
    * ROWS so both engines exclude the current row from the running max
    * identically. */
  private val p64 = {
    val len = PipelineOps.SpanLen
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
       |s AS (
       |  SELECT doc_id, source,
       |         unnest(range(1, len(toks) - ${len - 2})) - 1 AS s,
       |         unnest([${hex63(s"array_to_string(toks[i:i+${len - 1}], ' ')")} FOR i IN range(1, len(toks) - ${len - 2})]) AS h
       |  FROM t WHERE len(toks) >= $len),
       |dup AS (SELECT h FROM s GROUP BY h HAVING count(*) >= 2),
       |m AS (SELECT s.doc_id, s.source, s.s AS rs, s.s + $len AS re FROM s JOIN dup USING (h)),
       |isl AS (
       |  SELECT doc_id, source, rs, re,
       |         CASE WHEN max(re) OVER (PARTITION BY doc_id ORDER BY rs ASC, re ASC
       |                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |                OR rs > max(re) OVER (PARTITION BY doc_id ORDER BY rs ASC, re ASC
       |                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |              THEN 1 ELSE 0 END AS ni
       |  FROM m),
       |isl2 AS (
       |  SELECT *, sum(ni) OVER (PARTITION BY doc_id ORDER BY rs ASC, re ASC
       |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM isl),
       |r AS (
       |  SELECT doc_id, source, island, min(rs) AS rs, max(re) AS re
       |  FROM isl2 GROUP BY doc_id, source, island)
       |SELECT source,
       |       count(DISTINCT doc_id)::BIGINT AS n_docs_flagged,
       |       count(*)::BIGINT AS n_ranges,
       |       CAST(sum(re - rs) AS BIGINT) AS tokens_flagged,
       |       CAST(max(re - rs) AS BIGINT) AS max_range,
       |       CAST(sum((doc_id % 997 + 1) * (rs * 131 + re)) AS BIGINT) AS range_checksum
       |FROM r GROUP BY source ORDER BY source""".stripMargin
  }

  /** p65: the same salted-hash order, shard split, per-shard rank and
    * exclusive token cumsum — windows written directly over the hash. */
  private val p65 = {
    val s = PipelineOps.TrainShards
    s"""WITH t AS (
       |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
       |         CAST(${hex12("'ord:' || CAST(doc_id AS VARCHAR)")} AS BIGINT) AS ord
       |  FROM documents),
       |s AS (SELECT doc_id, n_tokens, ord, ord % $s AS shard FROM t)
       |SELECT doc_id, shard,
       |       CAST(row_number() OVER w AS BIGINT) AS pos,
       |       coalesce(CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY ord, doc_id
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS start_tok,
       |       n_tokens
       |FROM s WINDOW w AS (PARTITION BY shard ORDER BY ord, doc_id)
       |ORDER BY shard, pos""".stripMargin
  }

  /** p66: per-source score histogram → running cumsum → k-th-smallest
    * threshold → keep/drop rollup, all integer. */
  private val p66 = {
    val pct = PipelineOps.CalibDropPct
    s"""WITH sc AS (
       |  SELECT source, n_chars::BIGINT AS n_chars, len(toks)::BIGINT AS n_tokens,
       |         len(toks)::BIGINT - 2 * len(list_filter(toks, t -> list_contains([${sqlList(PipelineOps.Stopwords)}], t)))::BIGINT AS score
       |  FROM (SELECT source, n_chars, string_split(text, ' ') AS toks FROM documents)),
       |h AS (SELECT source, score, count(*)::BIGINT AS cnt FROM sc GROUP BY 1, 2),
       |tt AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_src FROM h GROUP BY 1),
       |cum AS (
       |  SELECT h.source, h.score, tt.n_src,
       |         CAST(sum(h.cnt) OVER (PARTITION BY h.source ORDER BY h.score) AS BIGINT) AS cumn
       |  FROM h JOIN tt USING (source)),
       |thr AS (
       |  SELECT source, CAST(min(score) AS BIGINT) AS threshold
       |  FROM cum WHERE cumn >= (n_src * $pct + 99) // 100 GROUP BY source)
       |SELECT sc.source, thr.threshold, count(*)::BIGINT AS n_docs,
       |       CAST(sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(CASE WHEN score >= threshold THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
       |       CAST(sum(CASE WHEN score >= threshold THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM sc JOIN thr USING (source) GROUP BY 1, 2 ORDER BY 1""".stripMargin
  }

  /** p67: p44's deployed-quantizer assignment CTEs (same tie order), then
    * p57's ppm/L1 ladder over the parity halves. */
  private val p67 =
    s"""WITH qz AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QuantScale) AS BIGINT)) AS q
       |  FROM embeddings),
       |n AS (SELECT vec_id, q, list_sum([x[1] * x[2] FOR x IN list_zip(q, q)]) AS nrm FROM qz),
       |kk AS (SELECT greatest(1, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k FROM embeddings),
       |cents AS (SELECT vec_id AS cid, q AS qc, nrm AS nc FROM n WHERE vec_id < (SELECT k FROM kk) AND nrm > 0),
       |cr AS (
       |  SELECT n.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |           CAST(list_sum([x[1] * x[2] FOR x IN list_zip(n.q, c.qc)]) AS DOUBLE)
       |             / (sqrt(CAST(n.nrm AS DOUBLE)) * sqrt(CAST(c.nc AS DOUBLE))) DESC, c.cid ASC) AS crn
       |  FROM n CROSS JOIN cents c WHERE n.nrm > 0),
       |a AS (SELECT vec_id, cid FROM cr WHERE crn = 1),
       |c AS (
       |  SELECT cid,
       |         CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
       |         CAST(sum(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cand
       |  FROM a GROUP BY cid),
       |t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tot_ref, CAST(sum(n_cand) AS BIGINT) AS tot_cand FROM c),
       |r AS (
       |  SELECT cid, n_ref, n_cand,
       |         (n_ref * 1000000) // tot_ref AS ppm_ref,
       |         (n_cand * 1000000) // tot_cand AS ppm_cand
       |  FROM c CROSS JOIN t),
       |r2 AS (SELECT *, abs(ppm_ref - ppm_cand) AS ppm_delta FROM r),
       |l AS (SELECT CAST(sum(ppm_delta) AS BIGINT) AS corpus_l1_ppm FROM r2)
       |SELECT r2.cid, r2.n_ref, r2.n_cand, r2.ppm_ref, r2.ppm_cand,
       |       r2.ppm_delta, l.corpus_l1_ppm
       |FROM r2 CROSS JOIN l ORDER BY r2.cid""".stripMargin

  /** p68's body over an arbitrary documents-shaped relation: the PROVEN
    * p36 verdict SQL nested as a CTE (the p53 pattern) over the same
    * relation, joined to one projection, per-source rollup + corpus token
    * total. Shared with p70, whose oracle is exactly this body over the
    * p61-carved new snapshot (the delta-maintained card must match the
    * from-scratch card of the new corpus). */
  private def p68Sql(src: String) =
    s"""v AS (SELECT * FROM (WITH RECURSIVE ${p36Body(src)}) q),
       |d AS (
       |  SELECT doc_id, source, lang, n_chars::BIGINT AS n_chars,
       |         len(toks)::BIGINT AS n_tokens,
       |         len(toks)::BIGINT - 2 * len(list_filter(toks, t -> list_contains([${sqlList(PipelineOps.Stopwords)}], t)))::BIGINT AS score
       |  FROM (SELECT doc_id, source, lang, n_chars, string_split(text, ' ') AS toks FROM $src)),
       |j AS (SELECT d.*, v.reason FROM d JOIN v USING (doc_id)),
       |per AS (
       |  SELECT source, count(*)::BIGINT AS n_docs, count(DISTINCT lang)::BIGINT AS n_langs,
       |         CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |         CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |         CAST(sum(CASE WHEN reason = 'exact' THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups,
       |         CAST(sum(CASE WHEN reason = 'near' THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dups,
       |         CAST(sum(CASE WHEN reason = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |         CAST(sum(score) AS BIGINT) AS sum_score
       |  FROM j GROUP BY source),
       |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM per)
       |SELECT per.source, per.n_docs, per.n_langs, per.n_tokens, per.n_chars,
       |       (per.n_tokens * 1000000) // t.tot_tokens AS token_ppm,
       |       per.n_kept, per.n_exact_dups, per.n_near_dups,
       |       ((per.n_exact_dups + per.n_near_dups) * 1000000) // per.n_docs AS dup_ppm,
       |       per.sum_score
       |FROM per CROSS JOIN t ORDER BY per.source""".stripMargin

  private lazy val p68 = s"WITH ${p68Sql("documents")}"

  /** p70: p68's card over the p61-carved NEW snapshot — the
    * delta-maintained card must equal the from-scratch card. */
  private lazy val p70 =
    s"""WITH newsnap AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 7 = 3 THEN text || ' rev2' ELSE text END AS text,
       |         lang, source,
       |         len(CASE WHEN doc_id % 7 = 3 THEN text || ' rev2' ELSE text END)::BIGINT AS n_chars
       |  FROM documents WHERE doc_id % 10 <> 0),
       |${p68Sql("newsnap")}""".stripMargin

  /** p69: exact quantized-L2 top-k ground truth (brute force — ground
    * truth for a recall gate is exact search by definition) joined against
    * p37's PROVEN answer embedded as a nested CTE (the p53/p68 pattern);
    * recall as integer ppm over k, corpus recall replicated per row. */
  private lazy val p69 = {
    val k = PipelineOps.PqTopK
    s"""$quantCte,
       |ap AS (SELECT query_id, nbr_id FROM ($p37) x),
       |exr AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS nbr_id,
       |         row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |           CAST(list_sum([(x[1]-x[2])*(x[1]-x[2]) FOR x IN list_zip(a.q, b.q)]) AS BIGINT) ASC,
       |           b.vec_id ASC) AS rn
       |  FROM n a CROSS JOIN n b WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id),
       |ex AS (SELECT query_id, nbr_id FROM exr WHERE rn <= $k),
       |hits AS (
       |  SELECT query_id, count(*)::BIGINT AS n_hits
       |  FROM ex JOIN ap USING (query_id, nbr_id) GROUP BY 1),
       |per AS (
       |  SELECT q.query_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       |         ((coalesce(h.n_hits, 0) * 1000000) // $k)::BIGINT AS recall_ppm
       |  FROM (SELECT DISTINCT query_id FROM ex) q LEFT JOIN hits h USING (query_id)),
       |tot AS (SELECT CAST(sum(n_hits) AS BIGINT) AS s, count(*)::BIGINT AS nq FROM per)
       |SELECT per.query_id, per.n_hits, per.recall_ppm,
       |       ((tot.s * 1000000) // (tot.nq * $k))::BIGINT AS corpus_recall_ppm
       |FROM per CROSS JOIN tot ORDER BY per.query_id""".stripMargin
  }

  // p39's oracle is the direct exact computation — the sketch pass is an
  // execution strategy, not a semantics change, so the oracle never
  // mentions it: candidates + exact confirm must equal the full groupBy.
  private val p39 =
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |n AS (SELECT count(*)::BIGINT AS n_total FROM toks)
       |SELECT tok, count(*)::BIGINT AS freq, n_total,
       |       CAST(count(*) AS DOUBLE) / CAST(n_total AS DOUBLE) AS ratio
       |FROM toks, n GROUP BY tok, n_total
       |HAVING count(*) * ${PipelineOps.HeavyHitterDen} >= n_total
       |ORDER BY tok""".stripMargin

  // p40's oracle is likewise bloom-free: prefilter + exact confirm must
  // equal the plain exact join (false positives die in the confirm).
  private val p40 =
    s"""$shingleCtes,
       |d2 AS (SELECT doc_id, source FROM documents),
       |probe AS (
       |  SELECT DISTINCT unnest(hashes) AS ph FROM h WHERE doc_id < ${PipelineOps.BloomProbeDocs}),
       |corpus AS (
       |  SELECT h.doc_id, d2.source, len(hashes)::BIGINT AS n_grams, unnest(hashes) AS ph
       |  FROM h JOIN d2 USING (doc_id) WHERE h.doc_id >= ${PipelineOps.BloomProbeDocs}),
       |hits AS (
       |  SELECT doc_id, source, n_grams, count(*)::BIGINT AS n_hits
       |  FROM corpus JOIN probe USING (ph) GROUP BY doc_id, source, n_grams)
       |SELECT source, count(*)::BIGINT AS n_hit_docs,
       |       CAST(sum(CASE WHEN n_hits * ${PipelineOps.BloomHighDen} >= n_grams * ${PipelineOps.BloomHighNum} THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       |       CAST(sum(n_hits) AS BIGINT) AS sum_hits,
       |       CAST(sum(n_grams) AS BIGINT) AS sum_grams,
       |       CAST(CAST(sum(n_hits) AS BIGINT) AS DOUBLE) / CAST(CAST(sum(n_grams) AS BIGINT) AS DOUBLE) AS overlap
       |FROM hits GROUP BY source ORDER BY source""".stripMargin

  /** p41: the same integer-rational bigram score — conditional counts via
    * two grouped CTEs, per-instance `c12·SCALE DIV c1`, per-doc sums, flag
    * by cross-multiplication (identical int64 ladder to the Spark side). */
  private val p41 =
    s"""WITH t AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
       |  WHERE len(string_split(text, ' ')) >= 2),
       |g AS (
       |  SELECT doc_id, source, gg[1] AS w1, gg[2] AS w2
       |  FROM (SELECT doc_id, source,
       |          unnest([[toks[i], toks[i+1]] FOR i IN range(1, len(toks))]) AS gg
       |        FROM t)),
       |big AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM g GROUP BY w1, w2),
       |uni AS (SELECT w1, count(*)::BIGINT AS c1 FROM g GROUP BY w1),
       |scored AS (
       |  SELECT g.doc_id, g.source, (big.c12 * ${PipelineOps.LmScale}) // uni.c1 AS p_scaled
       |  FROM g JOIN big USING (w1, w2) JOIN uni USING (w1)),
       |perdoc AS (
       |  SELECT doc_id, source, count(*)::BIGINT AS n_bigrams,
       |         CAST(sum(p_scaled) AS BIGINT) AS score_sum
       |  FROM scored GROUP BY doc_id, source)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |       CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams,
       |       CAST(sum(score_sum) AS BIGINT) AS sum_score,
       |       CAST(sum(CASE WHEN score_sum * ${PipelineOps.LmLowDen} < n_bigrams * ${PipelineOps.LmScale} THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       |       CAST(CAST(sum(score_sum) AS BIGINT) AS DOUBLE) / CAST(CAST(sum(n_bigrams) AS BIGINT) AS DOUBLE) / ${PipelineOps.LmScale}.0 AS avg_p
       |FROM perdoc GROUP BY source ORDER BY source""".stripMargin

  /** p42: the oracle affords the per-group full sort the Spark side's
    * bin-then-refine avoids — the value at rank ceil(d·n/10) in value
    * order is tie-order-independent, so both forms must hash-match. */
  private val p42 =
    """WITH v AS (SELECT source, n_chars AS v FROM documents),
      |n AS (SELECT source, count(*)::BIGINT AS n FROM v GROUP BY source),
      |r AS (SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY v) AS rnk FROM v),
      |d AS (SELECT source, n, unnest(range(1, 10)) AS decile FROM n),
      |t AS (SELECT source, n, decile, (decile * n + 9) // 10 AS target FROM d)
      |SELECT t.source, t.decile::BIGINT AS decile, t.n, r.v AS value
      |FROM t JOIN r ON r.source = t.source AND r.rnk = t.target
      |ORDER BY t.source, decile""".stripMargin

  /** p43: the identical counter→cumulative→target ladder over the same
    * declared bin domain — integer arithmetic end-to-end, so the
    * bucket-edge estimates hash-match. */
  private val p43 = {
    val lo = PipelineOps.HistLo; val hi = PipelineOps.HistHi
    val nb = PipelineOps.HistNumBins; val span = hi - lo + 1
    s"""WITH b AS (
       |  SELECT source, ((least(greatest(n_chars, $lo), $hi) - $lo) * $nb) // $span AS bin
       |  FROM documents),
       |c AS (SELECT source, bin, count(*)::BIGINT AS c FROM b GROUP BY source, bin),
       |cum AS (
       |  SELECT source, bin, c,
       |         sum(c) OVER (PARTITION BY source ORDER BY bin
       |                      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM c),
       |n AS (SELECT source, sum(c)::BIGINT AS n FROM c GROUP BY source),
       |d AS (SELECT source, n, unnest(range(1, 10)) AS decile FROM n),
       |t AS (SELECT source, n, decile, (decile * n + 9) // 10 AS rank FROM d)
       |SELECT t.source, t.decile::BIGINT AS decile, t.n,
       |       ($lo + ((cum.bin + 1) * $span) // $nb)::BIGINT AS est
       |FROM t JOIN cum ON cum.source = t.source
       |  AND cum.cum >= t.rank AND cum.cum - cum.c < t.rank
       |ORDER BY t.source, decile""".stripMargin
  }

  /** p50: the p06/p23 trigram pair machinery verified once at the loosest
    * threshold, then classified per τ by exact integer cross-multiplication
    * — no double compares anywhere in the report. */
  private val p50 = {
    val taus = PipelineOps.SensitivityThresholds.mkString(", ")
    val tMin = PipelineOps.SensitivityThresholds.min
    s"""WITH g AS (
       |  SELECT doc_id, lang, source, CAST(floor(n_chars / 100.0) AS BIGINT) AS block,
       |         list_distinct([ (${hex12("substr(text, i, 3)")})::BIGINT FOR i IN range(1, len(text) - 1) ]) AS grams
       |  FROM documents WHERE len(text) >= 3),
       |j AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         len(list_intersect(a.grams, b.grams))::BIGINT AS inter,
       |         len(a.grams)::BIGINT AS ca, len(b.grams)::BIGINT AS cb
       |  FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.block = b.block AND a.doc_id < b.doc_id),
       |p AS (
       |  SELECT doc_a, doc_b, inter, ca + cb - inter AS uni FROM j
       |  WHERE inter * 100 >= (ca + cb - inter) * $tMin),
       |t AS (
       |  SELECT p.*, tau FROM p CROSS JOIN (SELECT unnest([$taus])::BIGINT AS tau)
       |  WHERE inter * 100 >= tau * uni),
       |pa AS (SELECT tau, count(*)::BIGINT AS n_pairs FROM t GROUP BY tau),
       |dd AS (SELECT DISTINCT tau, doc_b FROM t),
       |da AS (
       |  SELECT tau, count(*)::BIGINT AS n_docs_dropped,
       |         CAST(sum(d.n_chars) AS BIGINT) AS chars_dropped
       |  FROM dd JOIN documents d ON d.doc_id = dd.doc_b GROUP BY tau)
       |SELECT taus.tau AS threshold_pct,
       |       coalesce(pa.n_pairs, 0)::BIGINT AS n_pairs,
       |       coalesce(da.n_docs_dropped, 0)::BIGINT AS n_docs_dropped,
       |       coalesce(da.chars_dropped, 0)::BIGINT AS chars_dropped
       |FROM (SELECT unnest([$taus])::BIGINT AS tau) taus
       |LEFT JOIN pa ON pa.tau = taus.tau
       |LEFT JOIN da ON da.tau = taus.tau
       |ORDER BY threshold_pct""".stripMargin
  }

  /** p51: the p36 verdict joined to per-doc token counts, rolled up by
    * source — the stage-cost accounting report. */
  private val p51 =
    s"""WITH RECURSIVE ex AS (
       |  SELECT doc_id, text, lang, source, n_chars,
       |         min(doc_id) OVER (PARTITION BY md5(text)) AS canon
       |  FROM documents),
       |surv AS (SELECT * FROM ex WHERE doc_id = canon),
       |g AS (
       |  SELECT doc_id, lang, source, CAST(floor(n_chars / 100.0) AS BIGINT) AS block,
       |         list_distinct([ (${hex12("substr(text, i, 3)")})::BIGINT FOR i IN range(1, len(text) - 1) ]) AS grams
       |  FROM surv WHERE len(text) >= 3),
       |j AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         len(list_intersect(a.grams, b.grams))::BIGINT AS inter,
       |         len(a.grams)::BIGINT AS ca, len(b.grams)::BIGINT AS cb
       |  FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.block = b.block AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT doc_a, doc_b FROM j
       |  WHERE CAST(inter AS DOUBLE) / CAST(ca + cb - inter AS DOUBLE) >= 0.6),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
       |r AS (
       |  SELECT a AS d, a AS reach FROM e
       |  UNION
       |  SELECT r.d, e.b AS reach FROM r JOIN e ON r.reach = e.a),
       |cl AS (SELECT d, min(reach) AS cluster_id FROM r GROUP BY d),
       |v AS (
       |  SELECT ex.doc_id, ex.source,
       |         len(string_split(ex.text, ' '))::BIGINT AS n_tokens,
       |         CASE WHEN ex.doc_id <> ex.canon THEN 'exact'
       |              WHEN cl.cluster_id IS NOT NULL AND cl.cluster_id <> ex.doc_id THEN 'near'
       |              ELSE 'kept' END AS reason
       |  FROM ex LEFT JOIN cl ON cl.d = ex.doc_id)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |       CAST(sum(CASE WHEN reason <> 'exact' THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_after_exact,
       |       CAST(sum(CASE WHEN reason = 'kept' THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_after_near,
       |       CAST(sum(CASE WHEN reason = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept
       |FROM v GROUP BY source ORDER BY source""".stripMargin

  /** p48: p36's cluster machinery, canonical = per-cluster argmax of the
    * integer quality score (row_number ties broken by id, matching the
    * Spark side's min-struct on (−score, id)). */
  private val p48 =
    s"""WITH RECURSIVE ex AS (
       |  SELECT doc_id, text, lang, source, n_chars,
       |         min(doc_id) OVER (PARTITION BY md5(text)) AS canon,
       |         (len(string_split(text, ' '))
       |          - 2 * len(list_filter(string_split(text, ' '), t -> list_contains([${sqlList(PipelineOps.Stopwords)}], t))))::BIGINT AS score
       |  FROM documents),
       |surv AS (SELECT * FROM ex WHERE doc_id = canon),
       |g AS (
       |  SELECT doc_id, lang, source, CAST(floor(n_chars / 100.0) AS BIGINT) AS block,
       |         list_distinct([ (${hex12("substr(text, i, 3)")})::BIGINT FOR i IN range(1, len(text) - 1) ]) AS grams
       |  FROM surv WHERE len(text) >= 3),
       |j AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         len(list_intersect(a.grams, b.grams))::BIGINT AS inter,
       |         len(a.grams)::BIGINT AS ca, len(b.grams)::BIGINT AS cb
       |  FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source AND a.block = b.block AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT doc_a, doc_b FROM j
       |  WHERE CAST(inter AS DOUBLE) / CAST(ca + cb - inter AS DOUBLE) >= 0.6),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
       |r AS (
       |  SELECT a AS d, a AS reach FROM e
       |  UNION
       |  SELECT r.d, e.b AS reach FROM r JOIN e ON r.reach = e.a),
       |cl AS (SELECT d, min(reach) AS cluster_id FROM r GROUP BY d),
       |wc AS (
       |  SELECT surv.doc_id AS sid, surv.score,
       |         coalesce(cl.cluster_id, surv.doc_id) AS cluster
       |  FROM surv LEFT JOIN cl ON cl.d = surv.doc_id),
       |best AS (
       |  SELECT cluster, sid AS best_id, score AS best_score FROM (
       |    SELECT cluster, sid, score,
       |           row_number() OVER (PARTITION BY cluster ORDER BY score DESC, sid ASC) AS rn
       |    FROM wc) WHERE rn = 1),
       |scl AS (
       |  SELECT wc.sid, best.best_id, best.best_score
       |  FROM wc JOIN best ON best.cluster = wc.cluster)
       |SELECT ex.doc_id,
       |       CASE WHEN ex.doc_id <> ex.canon THEN 'exact'
       |            WHEN ex.doc_id <> scl.best_id THEN 'near'
       |            ELSE 'kept' END AS reason,
       |       scl.best_id AS canonical_id, scl.best_score AS canonical_score
       |FROM ex JOIN scl ON scl.sid = ex.canon
       |ORDER BY ex.doc_id""".stripMargin

  /** p44: same ⌈√n⌉ cell count (double sqrt both sides), same argmax-cosine
    * assignment as p24's cr0, same hot-cell QUALIFY as the Spark window. */
  /** p44's CTE chain over an arbitrary embeddings-shaped relation, with
    * the seed count pinned over `kkSrc` — shared with p62, whose oracle is
    * this body over the derived new-snapshot relation while the quantizer
    * size stays the DEPLOYED one (⌈√n⌉ of the full table). */
  private def p44Sql(embSrc: String, kkSrc: String): String = {
    val cap = PipelineOps.SemMaxCell
    val thr = PipelineOps.SemDupThreshold
    s"""qz AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QuantScale) AS BIGINT)) AS q
       |  FROM $embSrc),
       |n AS (SELECT vec_id, q, list_sum([x[1] * x[2] FOR x IN list_zip(q, q)]) AS nrm FROM qz),
       |kk AS (SELECT greatest(1, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k FROM $kkSrc),
       |cents AS (SELECT vec_id AS cid, q AS qc, nrm AS nc FROM n WHERE vec_id < (SELECT k FROM kk) AND nrm > 0),
       |cr AS (
       |  SELECT n.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |           CAST(list_sum([x[1] * x[2] FOR x IN list_zip(n.q, c.qc)]) AS DOUBLE)
       |             / (sqrt(CAST(n.nrm AS DOUBLE)) * sqrt(CAST(c.nc AS DOUBLE))) DESC, c.cid ASC) AS crn
       |  FROM n CROSS JOIN cents c WHERE n.nrm > 0),
       |a AS (SELECT vec_id, cid FROM cr WHERE crn = 1),
       |cell AS (
       |  SELECT a.vec_id, a.cid, n.q, n.nrm FROM a JOIN n USING (vec_id)
       |  QUALIFY count(*) OVER (PARTITION BY a.cid) <= $cap),
       |dups AS (
       |  SELECT y.vec_id, CAST(min(x.vec_id) AS BIGINT) AS dup_of
       |  FROM cell x JOIN cell y ON x.cid = y.cid AND x.vec_id < y.vec_id
       |  WHERE CAST(list_sum([z[1] * z[2] FOR z IN list_zip(x.q, y.q)]) AS DOUBLE)
       |          / (sqrt(CAST(x.nrm AS DOUBLE)) * sqrt(CAST(y.nrm AS DOUBLE))) >= $thr
       |  GROUP BY y.vec_id)
       |SELECT e.vec_id, a.cid, d.dup_of,
       |       (CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END)::BIGINT AS kept
       |FROM $embSrc e
       |LEFT JOIN a ON a.vec_id = e.vec_id
       |LEFT JOIN dups d ON d.vec_id = e.vec_id
       |ORDER BY e.vec_id""".stripMargin
  }

  private val p44 = s"WITH ${p44Sql("embeddings", "embeddings")}"

  /** p62: one-shot p44 semantics over the derived NEW embedding snapshot,
    * seeds (vec_id < deployed k) preserved by the carving. */
  private val p62 =
    s"""WITH newemb AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id < (SELECT greatest(1, CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM embeddings)
       |     OR vec_id % 10 <> 0),
       |${p44Sql("newemb", "embeddings")}""".stripMargin

  /** p52: trained-quantizer semantic dedup — p24's Lloyd-step training
    * (integer-mean centroids, `//` == `DIV`), then TOP-2 probe membership
    * (row_number ≤ 2 — the oracle can afford the naive window; the Spark
    * side uses the mergeable Bottom2 aggregate), p44's capped cell-pair
    * stage over the doubled membership, rank-1 cell in the verdict. */
  /** p52's body with the MEMBERSHIP side carved by `memberPred` while the
    * quantizer (k, seeds, the Lloyd step) stays pinned to the FULL
    * embeddings table — the deployed-artifact contract p62 established
    * for the seed path, here on the trained path (p73 gates the
    * bump-maintained chain against it). `memberPred = TRUE` is p52. */
  private def p52Sql(memberPred: String): String = {
    val K = "(SELECT k FROM kk)"
    val cap = PipelineOps.SemMaxCell
    val thr = PipelineOps.SemDupThreshold
    s"""$quantCte,
       |kk AS (SELECT greatest(1, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k FROM embeddings),
       |seeds AS (SELECT vec_id AS cid, q AS qc, nrm AS nc FROM n WHERE vec_id < $K AND nrm > 0),
       |cr0 AS (
       |  SELECT n.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |           CAST(list_sum([x[1] * x[2] FOR x IN list_zip(n.q, c.qc)]) AS DOUBLE)
       |             / (sqrt(CAST(n.nrm AS DOUBLE)) * sqrt(CAST(c.nc AS DOUBLE))) DESC, c.cid ASC) AS crn
       |  FROM n CROSS JOIN seeds c WHERE n.nrm > 0),
       |a0 AS (SELECT vec_id, cid FROM cr0 WHERE crn = 1),
       |counts AS (SELECT cid, count(*)::BIGINT AS cnt FROM a0 GROUP BY cid),
       |sums AS (
       |  SELECT a0.cid, i.i, CAST(sum(n.q[i.i]) AS BIGINT) AS s
       |  FROM a0 JOIN n USING (vec_id) CROSS JOIN (SELECT unnest(range(1, ${EmbDim + 1})) AS i) i
       |  GROUP BY a0.cid, i.i),
       |newc AS (
       |  SELECT sums.cid, list(s // cnt ORDER BY i) AS qm FROM sums JOIN counts USING (cid)
       |  GROUP BY sums.cid, cnt),
       |tc AS (SELECT cid, qm, list_sum([x[1] * x[2] FOR x IN list_zip(qm, qm)]) AS nm FROM newc
       |       WHERE list_sum([x[1] * x[2] FOR x IN list_zip(qm, qm)]) > 0),
       |memq AS (SELECT * FROM n WHERE $memberPred),
       |crp AS (
       |  SELECT n.vec_id, c.cid,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |           CAST(list_sum([x[1] * x[2] FOR x IN list_zip(n.q, c.qm)]) AS DOUBLE)
       |             / (sqrt(CAST(n.nrm AS DOUBLE)) * sqrt(CAST(c.nm AS DOUBLE))) DESC, c.cid ASC) AS crn
       |  FROM memq n CROSS JOIN tc c WHERE n.nrm > 0),
       |probes AS (SELECT vec_id, cid, crn FROM crp WHERE crn <= ${PipelineOps.IvfProbes}),
       |r1 AS (SELECT vec_id, cid FROM probes WHERE crn = 1),
       |cell AS (
       |  SELECT p.vec_id, p.cid, n.q, n.nrm FROM probes p JOIN memq n USING (vec_id)
       |  QUALIFY count(*) OVER (PARTITION BY p.cid) <= $cap),
       |dups AS (
       |  SELECT y.vec_id, CAST(min(x.vec_id) AS BIGINT) AS dup_of
       |  FROM cell x JOIN cell y ON x.cid = y.cid AND x.vec_id < y.vec_id
       |  WHERE CAST(list_sum([z[1] * z[2] FOR z IN list_zip(x.q, y.q)]) AS DOUBLE)
       |          / (sqrt(CAST(x.nrm AS DOUBLE)) * sqrt(CAST(y.nrm AS DOUBLE))) >= $thr
       |  GROUP BY y.vec_id)
       |SELECT e.vec_id, r1.cid, d.dup_of,
       |       (CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END)::BIGINT AS kept
       |FROM (SELECT vec_id FROM embeddings WHERE $memberPred) e
       |LEFT JOIN r1 ON r1.vec_id = e.vec_id
       |LEFT JOIN dups d ON d.vec_id = e.vec_id
       |ORDER BY e.vec_id""".stripMargin
  }

  private val p52 = p52Sql("TRUE")

  /** p73: the trained-path CDC chain — two maintained bumps (band 9
    * departs then returns; band 7 departs for good) against the frozen
    * full-corpus trained quantizer must answer as the one-shot p52 of
    * the FINAL carved snapshot. */
  private val p73 = p52Sql("vec_id % 10 <> 7")

  /** p74: the decoded-content fingerprint recomputed from the TEXT pixel
    * formulas (pixel k: B = text byte 3k, G = 3k+1, R = 3k+2, all mod
    * len; wsum_b weights blue by k+1) — the oracle never sees the binary,
    * so BMP bottom-up rows, PNG filters, and the zlib stream must all
    * reconstruct the same logical pixels to match. Replicas under
    * id+100001 land in the opposite container, exactly as the entry
    * builds them. */
  private val p74 =
    s"""WITH media AS (
       |  SELECT doc_id, text, n_chars FROM documents
       |  UNION ALL SELECT doc_id + 100001, text, n_chars FROM documents),
       |t AS (SELECT doc_id, (doc_id % 2 = 0) AS is_png,
       |             (n_chars % 12 + 1) AS iw, (n_chars % 9 + 1) AS ih,
       |             text, len(text) AS l FROM media),
       |f AS (SELECT doc_id, is_png, iw, ih,
       |        list_sum([ord(text[((3*k+2) % l)+1]) FOR k IN range(0, iw*ih)]) AS sum_r,
       |        list_sum([ord(text[((3*k+1) % l)+1]) FOR k IN range(0, iw*ih)]) AS sum_g,
       |        list_sum([ord(text[((3*k) % l)+1]) FOR k IN range(0, iw*ih)]) AS sum_b,
       |        list_sum([(k+1) * ord(text[((3*k) % l)+1]) FOR k IN range(0, iw*ih)]) AS wsum_b
       |      FROM t)
       |SELECT doc_id, min(doc_id) OVER w AS canonical_id,
       |       (CASE WHEN doc_id = min(doc_id) OVER w THEN 1 ELSE 0 END)::BIGINT AS kept,
       |       (CASE WHEN min(CASE WHEN is_png THEN 1 ELSE 0 END) OVER w
       |                  <> max(CASE WHEN is_png THEN 1 ELSE 0 END) OVER w
       |             THEN 1 ELSE 0 END)::BIGINT AS cross_codec
       |FROM f WINDOW w AS (PARTITION BY iw, ih, sum_r, sum_g, sum_b, wsum_b)
       |ORDER BY doc_id""".stripMargin

  /** p75: each frame's fingerprint recomputed from the text pixel
    * formulas with p28's per-frame seed (11·f) offsetting the source;
    * canonical = min (asset, frame) key per fingerprint. */
  private val p75 =
    s"""WITH vids AS (
       |  SELECT doc_id AS asset_id, text, n_chars FROM documents
       |  UNION ALL SELECT doc_id + 100000, text, n_chars FROM documents),
       |fr AS (
       |  SELECT asset_id, text, n_chars, len(text) AS l,
       |         unnest(range(0, n_chars % 6 + 2)) AS f
       |  FROM vids),
       |t AS (SELECT asset_id, f, ((asset_id + f) % 5 + 3) AS fw,
       |             ((n_chars + f) % 4 + 2) AS fh, (f * 11) AS seed, text, l FROM fr),
       |g AS (SELECT asset_id, f, fw, fh,
       |        list_sum([ord(text[((seed+3*k+2) % l)+1]) FOR k IN range(0, fw*fh)]) AS sum_r,
       |        list_sum([ord(text[((seed+3*k+1) % l)+1]) FOR k IN range(0, fw*fh)]) AS sum_g,
       |        list_sum([ord(text[((seed+3*k) % l)+1]) FOR k IN range(0, fw*fh)]) AS sum_b,
       |        list_sum([(k+1) * ord(text[((seed+3*k) % l)+1]) FOR k IN range(0, fw*fh)]) AS wsum_b
       |      FROM t),
       |k AS (SELECT *, asset_id * 8 + f AS fkey,
       |        min(asset_id * 8 + f) OVER (PARTITION BY fw, fh, sum_r, sum_g, sum_b, wsum_b) AS canon
       |      FROM g)
       |SELECT asset_id, f::BIGINT AS f,
       |       canon // 8 AS canonical_asset, (canon % 8)::BIGINT AS canonical_f,
       |       (CASE WHEN fkey = canon THEN 1 ELSE 0 END)::BIGINT AS kept,
       |       (CASE WHEN canon // 8 <> asset_id THEN 1 ELSE 0 END)::BIGINT AS cross_asset
       |FROM k ORDER BY asset_id, f""".stripMargin

  /** p45: DuckDB's RE2 and Spark's Java regex agree on the shipped
    * pattern class (word boundaries, char classes, bounded quantifiers);
    * replacement order is declaration order on both sides. */
  private val p45 = {
    val pats = PipelineOps.ScrubPatterns
    val countCols = pats.map { case (nm, p) =>
      s"len(regexp_extract_all(text, '$p'))::BIGINT AS hits_$nm"
    }.mkString(",\n       |         ")
    val redacted = pats.foldLeft("text") { case (e, (nm, p)) =>
      s"regexp_replace($e, '$p', '[${nm.toUpperCase}]', 'g')"
    }
    val totalExpr = pats.map { case (nm, _) => s"hits_$nm" }.mkString(" + ")
    val sumCols = pats.map { case (nm, _) =>
      s"CAST(sum(hits_$nm) AS BIGINT) AS hits_$nm"
    }.mkString(",\n       |       ")
    s"""WITH t AS (
       |  SELECT source,
       |         $countCols,
       |         $redacted AS redacted
       |  FROM documents),
       |u AS (
       |  SELECT source, ${pats.map(_._1).map(n => s"hits_$n").mkString(", ")},
       |         $totalExpr AS total_hits,
       |         ${hex12("redacted")} % ${PipelineOps.ScrubAuditMod} AS audit
       |  FROM t)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |       CAST(sum(CASE WHEN total_hits >= ${PipelineOps.ScrubFlagHits} THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |       $sumCols,
       |       CAST(sum(audit) AS BIGINT) AS redact_audit
       |FROM u GROUP BY source ORDER BY source""".stripMargin
  }

  /** p46: distinct (source, shingle-hash) self-join — per-doc distinct then
    * per-source DISTINCT collapses to the same set the Spark side builds. */
  private val p46 =
    s"""WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
       |s AS (
       |  SELECT source,
       |         list_distinct([toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]) AS shingles
       |  FROM t WHERE len(toks) >= 2),
       |d AS (
       |  SELECT DISTINCT source, h FROM (
       |    SELECT source, unnest(list_transform(shingles, sg -> ${hex12("sg")} % $BaseHashMod)) AS h FROM s)),
       |sz AS (SELECT source, count(*)::BIGINT AS n FROM d GROUP BY source),
       |p AS (
       |  SELECT a.source AS source_a, b.source AS source_b, count(*)::BIGINT AS n_shared
       |  FROM d a JOIN d b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2),
       |g AS (
       |  SELECT a.source AS source_a, b.source AS source_b, a.n AS n_a, b.n AS n_b
       |  FROM sz a JOIN sz b ON a.source < b.source)
       |SELECT g.source_a, g.source_b, g.n_a, g.n_b,
       |       COALESCE(p.n_shared, 0)::BIGINT AS n_shared,
       |       CAST(COALESCE(p.n_shared, 0) AS DOUBLE)
       |         / CAST(g.n_a + g.n_b - COALESCE(p.n_shared, 0) AS DOUBLE) AS jaccard
       |FROM g LEFT JOIN p ON p.source_a = g.source_a AND p.source_b = g.source_b
       |ORDER BY g.source_a, g.source_b""".stripMargin

  /** p53: wraps the PROVEN p36 verdict SQL as a nested CTE (DuckDB allows
    * WITH inside a parenthesized subquery) and re-derives the p18 bucket
    * recipe keyed on the transitively-resolved canonical — consistency
    * with p36 by construction, not by re-derivation. */
  private val p53 =
    s"""WITH v AS (SELECT * FROM ($p36) q),
       |t AS (
       |  SELECT v.doc_id, v.canonical_id, d.n_chars,
       |         ${hex12("CAST(v.canonical_id AS VARCHAR)")} % 100 AS cb,
       |         ${hex12("CAST(v.doc_id AS VARCHAR)")} % 100 AS nb
       |  FROM v JOIN documents d ON d.doc_id = v.doc_id),
       |s AS (
       |  SELECT *,
       |         CASE WHEN cb < 80 THEN 'train' WHEN cb < 90 THEN 'valid' ELSE 'test' END AS split,
       |         CASE WHEN nb < 80 THEN 'train' WHEN nb < 90 THEN 'valid' ELSE 'test' END AS naive_split
       |  FROM t)
       |SELECT split, count(*)::BIGINT AS n_docs,
       |       count(DISTINCT canonical_id)::BIGINT AS n_clusters,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |       CAST(sum(CASE WHEN split <> naive_split THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
       |FROM s GROUP BY split ORDER BY split""".stripMargin

  /** p54: wraps p51's proven budget SQL; `//`/`DIV` and `%` agree on
    * non-negative BIGINT, and ⌊√x⌋ is the identical correctly-rounded
    * double in both engines. Allocation uses the overflow-safe split
    * form ⌊B·w/W⌋ = (B//W)·w + ((B%W)·w)//W. */
  private val p54 =
    s"""WITH b AS (SELECT * FROM ($p51) q),
       |w AS (
       |  SELECT source, tokens_after_near AS kept_tokens,
       |         CAST(floor(sqrt(CAST(tokens_after_near AS DOUBLE))) AS BIGINT) AS weight
       |  FROM b),
       |t AS (
       |  SELECT CAST(sum(kept_tokens) AS BIGINT) AS total_kept,
       |         CAST(sum(weight) AS BIGINT) AS total_w
       |  FROM w),
       |p AS (
       |  SELECT w.source, w.kept_tokens, w.weight,
       |         (t.total_kept // 2) AS budget, t.total_w
       |  FROM w CROSS JOIN t),
       |a AS (
       |  SELECT source, kept_tokens, weight,
       |         CASE WHEN total_w > 0
       |              THEN (budget // total_w) * weight + ((budget % total_w) * weight) // total_w
       |              ELSE 0 END AS target_tokens
       |  FROM p)
       |SELECT source, kept_tokens, weight, target_tokens,
       |       CASE WHEN kept_tokens > 0
       |            THEN least(100, (target_tokens * 100) // kept_tokens)
       |            ELSE 0 END AS rate_pct,
       |       (kept_tokens * (CASE WHEN kept_tokens > 0
       |            THEN least(100, (target_tokens * 100) // kept_tokens)
       |            ELSE 0 END)) // 100 AS planned_tokens
       |FROM a ORDER BY source""".stripMargin

  /** p56: direct flags from p45's regex machinery, closure over p36's
    * proven verdict CTE — flags propagate via the canonical family. */
  private val p56 = {
    val hitSum = PipelineOps.ScrubPatterns
      .map { case (_, p) => s"len(regexp_extract_all(text, '$p'))" }
      .mkString(" + ")
    s"""WITH v AS (SELECT * FROM ($p36) q),
       |f AS (
       |  SELECT doc_id, source, n_chars,
       |         (($hitSum) >= ${PipelineOps.ScrubFlagHits}) AS direct_flag
       |  FROM documents),
       |pd AS (
       |  SELECT f.doc_id, f.source, f.n_chars, f.direct_flag, v.canonical_id
       |  FROM f JOIN v ON v.doc_id = f.doc_id),
       |cf AS (
       |  SELECT canonical_id,
       |         max(CASE WHEN direct_flag THEN 1 ELSE 0 END)::BIGINT AS cluster_flag
       |  FROM pd GROUP BY canonical_id)
       |SELECT pd.source, count(*)::BIGINT AS n_docs,
       |       CAST(sum(CASE WHEN pd.direct_flag THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged_direct,
       |       CAST(sum(cf.cluster_flag) AS BIGINT) AS n_flagged_closure,
       |       CAST(sum(CASE WHEN cf.cluster_flag = 1 THEN pd.n_chars ELSE 0 END) AS BIGINT) AS chars_at_risk
       |FROM pd JOIN cf ON cf.canonical_id = pd.canonical_id
       |GROUP BY pd.source ORDER BY pd.source""".stripMargin
  }

  /** p57: integer-ppm mixture rates per slice; `//` == `DIV` on
    * non-negative BIGINT keeps the drift score engine-identical. */
  private val p57 =
    s"""WITH d AS (SELECT lang, (doc_id % 2 = 0) AS is_ref FROM documents),
       |c AS (
       |  SELECT lang,
       |         CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
       |         CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cand
       |  FROM d GROUP BY lang),
       |t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tot_ref, CAST(sum(n_cand) AS BIGINT) AS tot_cand FROM c),
       |r AS (
       |  SELECT lang, n_ref, n_cand,
       |         (n_ref * 1000000) // tot_ref AS ppm_ref,
       |         (n_cand * 1000000) // tot_cand AS ppm_cand
       |  FROM c CROSS JOIN t),
       |r2 AS (SELECT *, abs(ppm_ref - ppm_cand) AS ppm_delta FROM r),
       |l AS (SELECT CAST(sum(ppm_delta) AS BIGINT) AS corpus_l1_ppm FROM r2)
       |SELECT r2.lang, r2.n_ref, r2.n_cand, r2.ppm_ref, r2.ppm_cand,
       |       r2.ppm_delta, l.corpus_l1_ppm
       |FROM r2 CROSS JOIN l ORDER BY r2.lang""".stripMargin

  /** p59: same deterministic snapshot carving, full-outer hash compare. */
  private val p59 =
    s"""WITH o AS (
       |  SELECT doc_id, source, md5(text) AS h_old, n_chars AS chars_old
       |  FROM documents WHERE doc_id % 10 <> 9),
       |n AS (
       |  SELECT doc_id, source AS source_new,
       |         md5(CASE WHEN doc_id % 7 = 3 THEN text || ' rev2' ELSE text END) AS h_new,
       |         len(CASE WHEN doc_id % 7 = 3 THEN text || ' rev2' ELSE text END)::BIGINT AS chars_new
       |  FROM documents WHERE doc_id % 10 <> 0),
       |j AS (
       |  SELECT COALESCE(o.source, n.source_new) AS src,
       |         CASE WHEN o.h_old IS NULL THEN 'added'
       |              WHEN n.h_new IS NULL THEN 'removed'
       |              WHEN o.h_old <> n.h_new THEN 'changed'
       |              ELSE 'unchanged' END AS cls,
       |         n.chars_new, o.chars_old
       |  FROM o FULL OUTER JOIN n ON n.doc_id = o.doc_id)
       |SELECT src AS source,
       |       CAST(sum(CASE WHEN cls = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       |       CAST(sum(CASE WHEN cls = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |       CAST(sum(CASE WHEN cls = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       |       CAST(sum(CASE WHEN cls = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
       |       CAST(COALESCE(sum(CASE WHEN cls IN ('added','changed') THEN chars_new END), 0) AS BIGINT) AS chars_in,
       |       CAST(COALESCE(sum(CASE WHEN cls IN ('removed','changed') THEN chars_old END), 0) AS BIGINT) AS chars_out
       |FROM j GROUP BY src ORDER BY src""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "p01_text_stats"    -> p01,
    "p02_quality"       -> p02,
    "p03_exact_dedup"   -> p03,
    "p04_minhash_pairs" -> p04,
    "p05_simhash"       -> p05,
    "p06_ngram_jaccard" -> p06,
    "p07_ann_brute"     -> p07,
    "p08_ann_lsh"       -> p08,
    "p09_events_json"   -> p09,
    "p10_langid"        -> p10,
    "p11_token_counts"  -> p11,
    "p12_fingerprints"  -> p12,
    "p13_multimodal"    -> p13,
    "p14_emb_dedup"     -> p14,
    "p15_ann_ivf"       -> p15,
    "p16_sessions"      -> p16,
    "p17_rare_tokens"   -> p17,
    "p18_hash_split"    -> p18,
    "p19_contamination" -> p19,
    "p20_repetition"    -> p20,
    "p21_packing"       -> p21,
    "p22_mixture"       -> p22,
    "p23_dup_clusters"  -> p23,
    "p24_kmeans"        -> p24,
    "p25_asof"          -> p25,
    "p26_interval"      -> p26,
    "p27_bpe_merges"    -> p27,
    "p28_frame_sample"  -> p28,
    "p29_kmv_distinct"  -> p29,
    "p30_dup_spans"     -> p30,
    "p31_tfidf"         -> p31,
    "p32_strat_sample"  -> p32,
    "p33_funnel"        -> p33,
    "p34_ann_pq"        -> p34,
    "p35_simhash_pairs" -> p35,
    "p36_dedup_verdict" -> p36,
    "p37_ann_ivfpq"     -> p37,
    // the incremental refresh must converge to the one-shot verdict, so
    // p36's oracle IS p38's oracle — the gate proves batch-boundary
    // invisibility cross-engine, not just Spark-vs-Spark
    "p38_dedup_incremental" -> p36,
    "p39_heavy_hitters" -> p39,
    "p40_bloom_decontam" -> p40,
    "p41_lm_score"      -> p41,
    "p42_quantiles"     -> p42,
    "p43_hist_quantiles" -> p43,
    "p44_semdedup"      -> p44,
    "p45_scrub"         -> p45,
    "p46_source_overlap" -> p46,
    // the incremental semantic refresh must converge to the one-shot
    // verdict, so p44's oracle IS p47's oracle — batch boundaries must be
    // cross-engine invisible (the p38 contract on the vector side)
    "p47_semdedup_incremental" -> p44,
    "p48_keep_best"     -> p48,
    // the persisted index must answer exactly like computing from scratch
    // — p37's oracle IS p49's oracle (the rebuild-consistency guarantee)
    "p49_ann_indexed"   -> p37,
    "p50_dedup_sensitivity" -> p50,
    "p51_dedup_budget"  -> p51,
    "p52_semdedup_trained" -> p52,
    "p53_safe_split"    -> p53,
    "p54_mixture_plan"  -> p54,
    // the incremental trained-quantizer refresh must converge to the
    // one-shot — p52's oracle IS p55's oracle (the p47 contract on the
    // trained/multi-probe path)
    "p55_semdedup_trained_incremental" -> p52,
    "p56_scrub_closure" -> p56,
    "p57_drift_monitor" -> p57,
    // build-half + frozen-quantizer append must answer exactly like a
    // one-shot full build — p37's oracle IS p58's (the p49 contract
    // extended to the grow-in-place path)
    "p58_ann_index_refresh" -> p37,
    "p59_corpus_delta"  -> p59,
    // the table-served verdict must hash-match recomputing p36 from
    // scratch — p36's oracle IS p60's oracle (the p49 rebuild-consistency
    // guarantee applied to the materialized dedup artifact)
    "p60_verdict_table" -> p36,
    // delta-maintained state (retire + one incremental batch) must answer
    // as a from-scratch dedup of the new snapshot — p36's body over the
    // derived new-snapshot relation IS p61's oracle
    "p61_dedup_delta"   -> p61,
    // the p61 contract on the vector side: retire + reopened-cell rebuild
    // + one incremental batch must answer as one-shot p44 over the new
    // snapshot under the deployed (full-table) quantizer
    "p62_semdedup_delta" -> p62,
    // tombstoned index + frozen-quantizer appends must answer as a
    // from-scratch p37 build on the new snapshot (the p58 contract
    // extended to deletes)
    "p63_ann_index_delta" -> p63,
    "p64_span_scrub"    -> p64,
    "p65_training_order" -> p65,
    "p66_calibrated_filter" -> p66,
    "p67_embedding_drift" -> p67,
    "p68_dataset_card"  -> p68,
    "p69_ann_recall"    -> p69,
    // the delta-maintained card must equal the from-scratch card of the
    // new snapshot — p68's body over p61's carving IS p70's oracle
    "p70_dataset_card_delta" -> p70,
    // two chained CDC bumps through durable StateStore checkpoints must
    // converge to the from-scratch p36 verdict of the final snapshot
    "p71_ingest_bump"   -> p71,
    // p72 gates the CDC-FED chain against the same from-scratch p36 of
    // the final snapshot — the oracle is identical by design; the paths
    // under test (feed-trusting delta hashing, LSM delta persistence,
    // survivor promotion via corpus fetch) differ entirely
    "p72_cdc_chain"     -> p71,
    "p73_trained_cdc"   -> p73,
    "p74_media_dedup"   -> p74,
    "p75_frame_dedup"   -> p75)
}
