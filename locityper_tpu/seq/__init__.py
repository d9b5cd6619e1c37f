from .dna import encode, decode, revcomp, gc_content, has_n  # noqa: F401
from .contigs import ContigNames, ContigSet, Genotype, Interval  # noqa: F401
