package graft.sources

/** Ensembl Variation consequence terms with VEP severity ranking
  * (reference: assets/variant_consequences.py:86-280; ranking from
  * ensembl-variation Constants.pm). Score = round(1 - rank/41, 2) — higher
  * is more severe, distinct per term, aligned with mostSevereConsequence.
  *
  * Note: the reference file carries a typo for rank 19
  * ("incomplete_labelinal_codon_variant", an errant term→label rename); the
  * actual Ensembl VEP term "incomplete_terminal_codon_variant" is used here.
  */
object VariantConsequences {

  final case class Term(id: String, label: String, impact: String, rank: Int) {
    def score: Double = math.round((1.0 - rank.toDouble / terms.length) * 100.0) / 100.0
  }

  val terms: Seq[Term] = Seq(
    Term("SO_0001893", "transcript_ablation", "HIGH", 1),
    Term("SO_0001574", "splice_acceptor_variant", "HIGH", 2),
    Term("SO_0001575", "splice_donor_variant", "HIGH", 3),
    Term("SO_0001587", "stop_gained", "HIGH", 4),
    Term("SO_0001589", "frameshift_variant", "HIGH", 5),
    Term("SO_0001578", "stop_lost", "HIGH", 6),
    Term("SO_0002012", "start_lost", "HIGH", 7),
    Term("SO_0001889", "transcript_amplification", "HIGH", 8),
    Term("SO_0001907", "feature_elongation", "HIGH", 9),
    Term("SO_0001906", "feature_truncation", "HIGH", 10),
    Term("SO_0001821", "inframe_insertion", "MODERATE", 11),
    Term("SO_0001822", "inframe_deletion", "MODERATE", 12),
    Term("SO_0001583", "missense_variant", "MODERATE", 13),
    Term("SO_0001818", "protein_altering_variant", "MODERATE", 14),
    Term("SO_0001787", "splice_donor_5th_base_variant", "LOW", 15),
    Term("SO_0001630", "splice_region_variant", "LOW", 16),
    Term("SO_0002170", "splice_donor_region_variant", "LOW", 17),
    Term("SO_0002169", "splice_polypyrimidine_tract_variant", "LOW", 18),
    Term("SO_0001626", "incomplete_terminal_codon_variant", "LOW", 19),
    Term("SO_0002019", "start_retained_variant", "LOW", 20),
    Term("SO_0001567", "stop_retained_variant", "LOW", 21),
    Term("SO_0001819", "synonymous_variant", "LOW", 22),
    Term("SO_0001580", "coding_sequence_variant", "MODIFIER", 23),
    Term("SO_0001620", "mature_miRNA_variant", "MODIFIER", 24),
    Term("SO_0001623", "5_prime_UTR_variant", "MODIFIER", 25),
    Term("SO_0001624", "3_prime_UTR_variant", "MODIFIER", 26),
    Term("SO_0001792", "non_coding_transcript_exon_variant", "MODIFIER", 27),
    Term("SO_0001627", "intron_variant", "MODIFIER", 28),
    Term("SO_0001621", "NMD_transcript_variant", "MODIFIER", 29),
    Term("SO_0001619", "non_coding_transcript_variant", "MODIFIER", 30),
    Term("SO_0001968", "coding_transcript_variant", "MODIFIER", 31),
    Term("SO_0001631", "upstream_gene_variant", "MODIFIER", 32),
    Term("SO_0001632", "downstream_gene_variant", "MODIFIER", 33),
    Term("SO_0001895", "TFBS_ablation", "MODERATE", 34),
    Term("SO_0001892", "TFBS_amplification", "MODIFIER", 35),
    Term("SO_0001782", "TF_binding_site_variant", "MODIFIER", 36),
    Term("SO_0001894", "regulatory_region_ablation", "MODIFIER", 37),
    Term("SO_0001891", "regulatory_region_amplification", "MODIFIER", 38),
    Term("SO_0001566", "regulatory_region_variant", "MODIFIER", 39),
    Term("SO_0001628", "intergenic_variant", "MODIFIER", 40),
    Term("SO_0001060", "sequence_variant", "MODIFIER", 41)
  )

  /** label → SO identifier (vep_parser.py SEQUENCE_ONTOLOGY_MAP). */
  val soMap: Map[String, String] = terms.map(t => t.label -> t.id).toMap

  /** label → severity score (vep_parser.py LABEL_TO_SCORE_MAP). */
  val scoreMap: Map[String, Double] = terms.map(t => t.label -> t.score).toMap
}
