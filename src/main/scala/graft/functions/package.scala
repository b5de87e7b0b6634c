package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Column-level entry points for graft's native Catalyst expressions. */
package object functions {
  private def expr(c: Column) = ColumnBridge.expression(c)
  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    ColumnBridge.column(e)

  /** Python `str.capitalize` semantics (SURVEY.md F3). */
  def py_capitalize(c: Column): Column = col(PyCapitalize(expr(c)))

  /** Python `str.title` semantics (SURVEY.md F4). */
  def py_title(c: Column): Column = col(PyTitle(expr(c)))

  /** Unicode NFC canonicalization (codegen; see [[UnicodeNorm]]). */
  def nfc_normalize(c: Column): Column = col(NfcNormalize(expr(c)))

  /** Unicode NFKC compatibility normalization (codegen). */
  def nfkc_normalize(c: Column): Column = col(NfkcNormalize(expr(c)))

  /** Cosine similarity between two `array<float>` columns. */
  def cosine_similarity(a: Column, b: Column): Column =
    col(CosineSimilarity(expr(a), expr(b)))

  /** Cosine similarity of an `array<float>` column against an
    * `array<double>` centroid column (see [[graft.operators.Clustering]]).
    */
  def cosine_similarity_fd(a: Column, centroid: Column): Column =
    col(CosineSimilarityFD(expr(a), expr(centroid)))

  /** Dot product of two `array<float>` columns. */
  def dot_product(a: Column, b: Column): Column = col(DotProduct(expr(a), expr(b)))

  /** Morton (Z-order) interleave of two `bits`-wide longs. */
  def interleave_bits(a: Column, b: Column, bits: Int): Column =
    col(InterleaveBits(expr(a), expr(b), bits))

  /** One-pass int8 quantization: struct<scale:double, qvec:array<int>>. */
  def quantize_int8(a: Column): Column = col(QuantizeInt8(expr(a)))

  /** PQ codes of a vector under trained codebooks (codegen argmin loops). */
  def pq_encode(a: Column, cents: Array[Array[Array[Double]]]): Column =
    col(PqEncode(expr(a), cents))

  /** ADC lookup-sum score over PQ codes and a query lookup table. */
  def adc_score(codes: Column, lut: Column, ksub: Int): Column =
    col(AdcScore(expr(codes), expr(lut), ksub))

  /** Unit-normalize an `array<double>` to `array<float>`; null when the
    * norm is zero (see [[NormalizeUnitF]]).
    */
  def normalize_unit(c: Column): Column = col(NormalizeUnitF(expr(c)))

  /** L2 norm of an `array<float>` column. */
  def vector_norm(c: Column): Column = col(VectorNorm(expr(c)))

  /** Sign-random-projection LSH signature of an `array<float>` column.
    * `portable = true` derives hyperplane weights from md5
    * (oracle-reproducible) instead of the splitmix64 mix.
    */
  def srp_signature(c: Column, bits: Int = 16, seed: Long = 42L,
                    portable: Boolean = false): Column =
    col(SrpSignature(expr(c), bits, seed, portable))

  /** Multi-probe SRP: signature + `flips` lowest-|margin| bit variants. */
  def srp_probes(c: Column, bits: Int, seed: Long, flips: Int,
                 portable: Boolean = false): Column =
    col(SrpProbes(expr(c), bits, seed, flips, portable))

  /** Membership probe of a LONG column against a serialized
    * `org.apache.spark.util.sketch.BloomFilter` (Spark's own codegen'd
    * BloomFilterMightContain — the expression behind runtime row-level
    * filtering). `bloomBytes` is typically a literal built once from the
    * small side; the probe is map-only.
    */
  def might_contain_long(bloomBytes: Column, value: Column): Column =
    col(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      expr(bloomBytes), expr(value)))

  /** One-pass character-distribution stats:
    * struct<n_chars, n_distinct, top_frac, simpson, entropy> (raw,
    * unrounded — see [[CharDistOps.stats]]).
    */
  def char_dist_stats(c: Column): Column = col(CharDistStats(expr(c)))

  /** Distinct portable (md5-poly) k-token shingle hashes of a text column. */
  def portable_shingles(c: Column, k: Int): Column = col(PortableShingles(expr(c), k))

  /** Positional (non-distinct, in-order) portable k-token shingle hashes:
    * element i covers tokens [i, i+k); empty below k tokens.
    */
  def portable_shingles_pos(c: Column, k: Int): Column =
    col(PortableShinglesPos(expr(c), k))

  /** 64-bit SimHash of an `array<string>` token column. `portable = true`
    * hashes tokens with md5 (oracle-reproducible in ANSI SQL) instead of
    * the faster splitmix64 scheme.
    */
  def simhash64(c: Column, portable: Boolean = false): Column =
    col(SimHash64(expr(c), portable))
}
