from .alphabet import DNA5, CodingDNA5, AminoAcid
from .sequence import (
    StrandSense,
    DNA5SequenceLinear,
    DNA5SequenceCoding,
    AminoSequence,
)
from .tables import TranslationTable, amino_translation_table, codon_indices
