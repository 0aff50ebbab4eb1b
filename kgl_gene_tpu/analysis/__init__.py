"""Analysis plugins: importing this package registers all analyses in the
factory map (kga_analysis_factory.cpp:31-41 analogue)."""

from .null_analysis import NullAnalysis
from .sequence_analysis import SequenceAnalysis
from .info_analysis import InfoFilterAnalysis, IntervalAnalysis, JsonAnalysis
from .inbreed_analysis import InbreedAnalysis
from .pfemp_analysis import PfEMPAnalysis
from .mutation_analysis import MutationAnalysis
from .literature_analysis import LiteratureAnalysis
