package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Perceptual fingerprints over DECODED media statistics — the
  * multimodal twins of the text fingerprint family (TextOps.simhash63
  * / charFingerprint): a 63-bit image dHash over a pooled luma grid and
  * an audio loudness-contour hash over an envelope vector. Both are
  * pure column expressions over the (small) per-row feature arrays the
  * codec stages emit — fully codegen'd, no UDF, no shuffle to
  * fingerprint — and both are COMPARATIVE (each bit is an
  * adjacent-cell `>`), which is what buys the perceptual invariances:
  * a global brightness offset shifts every luma cell equally and a
  * volume change scales every envelope cell positively, so neither
  * flips any bit. Downstream, the hashes ride the exact same banded
  * Hamming self-join machinery as SimHash (q107) or plain group-by
  * dedup — the reference has no media dedup at all (432-LoC event toy);
  * this is north-star extension surface per SURVEY §2.
  */
object MediaFingerprint {

  /** 63-bit difference hash (dHash) over a row-major `gw`×`gh` mean-luma
    * grid column (`array<float>` from
    * [[graft.multimodal.Multimodal.imageGridsBatched]], classic shape
    * 9×8): bit `k` (k = i·(gw−1)+j, first 63 of the (gw−1)·gh
    * comparisons) is set iff cell (i,j) is STRICTLY brighter than its
    * right neighbor (i,j+1). 63 bits keeps the packed hash a positive
    * BIGINT — band-extraction shifts never smear sign (same reasoning
    * as TextOps.simhash63InRow). */
  def dhash63(grid: Column, gw: Int, gh: Int): Column = {
    require(gw >= 2 && gh >= 1 && (gw - 1) * gh >= 63,
      s"dhash63 needs at least 63 adjacent-cell comparisons, " +
        s"got ${(gw - 1) * gh} from a ${gw}x$gh grid")
    val bits = (0 until 63).map { k =>
      val i = k / (gw - 1); val j = k % (gw - 1)
      when(element_at(grid, i * gw + j + 1) > element_at(grid, i * gw + j + 2),
        lit(1L << k)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Loudness-contour fingerprint over a `cells`-cell mean-|amplitude|
    * envelope column (`array<float>` from PcmCodec.envelopeGrid): bit
    * `k` is set iff cell k+1 is STRICTLY louder than cell k —
    * `cells−1` bits packed into an INT. Volume-invariant by
    * construction (positive gain preserves every comparison), which is
    * the property that makes it a dedup key across re-encoded /
    * re-mastered copies of the same recording. */
  def contourBits(env: Column, cells: Int): Column = {
    require(cells >= 2 && cells <= 32,
      s"contourBits supports 2..32 envelope cells, got $cells")
    val bits = (0 until cells - 1).map { k =>
      when(element_at(env, k + 2) > element_at(env, k + 1),
        lit(1 << k)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }
}
