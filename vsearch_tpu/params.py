"""Run configuration for vsearch_tpu.

A single dataclass mirroring the reference's ~200-field ``Parameters`` struct
(reference: src/vsearch.h:224-539) so that every engine reads configuration
through one object and the CLI can populate it 1:1 from the reference's
option names.  Defaults are the library defaults from vsearch.h; sentinel
resolution follows ``vsearch_apply_defaults_fixups`` (src/vsearch.cc:186-276)
and the command-specific defaults applied at parse time
(src/cli.cc:4451-4522).
"""

from __future__ import annotations

import dataclasses
import enum
import math
import os
import sys
from typing import List, Optional

INT64_MAX = 2**63 - 1
INT_MAX = 2**31 - 1
INT64_MIN_LONG = -(2**63)  # LONG_MIN used as truncqual sentinel
DBL_MAX = sys.float_info.max

DEFAULT_FASTA_WIDTH = 80
DEFAULT_MAXSEQLENGTH = 50000
DEFAULT_ASCII_OFFSET = 33
DEFAULT_MAX_QUALITY = 41

# Default minimum number of word matches for word lengths 3-15
# (reference: src/core/searchcore.hpp:75-76)
MINWORDMATCHES_DEFAULTS = [-1, -1, -1, 18, 17, 16, 15, 14, 12, 11, 10, 9, 8, 7, 5, 3]

MAXPARENTS = 100  # reference: src/core/chimera.cpp maxparts


class Masking(enum.Enum):
    none = 0
    dust = 1
    soft = 2
    error = 3   # invalid CLI argument; rejected in validate_option_values


@dataclasses.dataclass
class Parameters:
    # command selectors (filename argument of the chosen command)
    opt_allpairs_global: Optional[str] = None
    opt_chimeras_denovo: Optional[str] = None
    opt_cluster_fast: Optional[str] = None
    opt_cluster_size: Optional[str] = None
    opt_cluster_smallmem: Optional[str] = None
    opt_cluster_unoise: Optional[str] = None
    opt_cut: Optional[str] = None
    opt_cut_pattern: str = ""
    opt_db: Optional[str] = None
    opt_derep_fulllength: Optional[str] = None
    opt_derep_id: Optional[str] = None
    opt_derep_prefix: Optional[str] = None
    opt_derep_smallmem: Optional[str] = None
    opt_fasta2fastq: Optional[str] = None
    opt_fastq_chars: Optional[str] = None
    opt_fastq_convert: Optional[str] = None
    opt_fastq_eestats: Optional[str] = None
    opt_fastq_eestats2: Optional[str] = None
    opt_fastq_filter: Optional[str] = None
    opt_fastq_join: Optional[str] = None
    opt_fastq_mergepairs: Optional[str] = None
    opt_fastq_stats: Optional[str] = None
    opt_fastx_filter: Optional[str] = None
    opt_fastx_getseq: Optional[str] = None
    opt_fastx_getseqs: Optional[str] = None
    opt_fastx_getsubseq: Optional[str] = None
    opt_fastx_mask: Optional[str] = None
    opt_fastx_revcomp: Optional[str] = None
    opt_fastx_subsample: Optional[str] = None
    opt_fastx_syncpairs: Optional[str] = None
    opt_fastx_uniques: Optional[str] = None
    opt_makeudb_usearch: Optional[str] = None
    opt_maskfasta: Optional[str] = None
    opt_orient: Optional[str] = None
    opt_rereplicate: Optional[str] = None
    opt_search_exact: Optional[str] = None
    opt_sff_convert: Optional[str] = None
    opt_shuffle: Optional[str] = None
    opt_sintax: Optional[str] = None
    opt_sortbylength: Optional[str] = None
    opt_sortbysize: Optional[str] = None
    opt_uchime_denovo: Optional[str] = None
    opt_uchime2_denovo: Optional[str] = None
    opt_uchime3_denovo: Optional[str] = None
    opt_uchime_ref: Optional[str] = None
    opt_udb2fasta: Optional[str] = None
    opt_udbinfo: Optional[str] = None
    opt_udbstats: Optional[str] = None
    opt_usearch_global: Optional[str] = None

    # output files
    opt_alnout: Optional[str] = None
    opt_biomout: Optional[str] = None
    opt_blast6out: Optional[str] = None
    opt_borderline: Optional[str] = None
    opt_centroids: Optional[str] = None
    opt_chimeras: Optional[str] = None
    opt_clusters: Optional[str] = None
    opt_consout: Optional[str] = None
    opt_dbmatched: Optional[str] = None
    opt_dbnotmatched: Optional[str] = None
    opt_eetabbedout: Optional[str] = None
    opt_fastaout: Optional[str] = None
    opt_fastaout_rev: Optional[str] = None
    opt_fastaout_discarded: Optional[str] = None
    opt_fastaout_discarded_rev: Optional[str] = None
    opt_fastaout_orphans: Optional[str] = None
    opt_fastaout_orphans_rev: Optional[str] = None
    opt_fastaout_notmerged_fwd: Optional[str] = None
    opt_fastaout_notmerged_rev: Optional[str] = None
    opt_fastapairs: Optional[str] = None
    opt_fastqout: Optional[str] = None
    opt_fastqout_rev: Optional[str] = None
    opt_fastqout_discarded: Optional[str] = None
    opt_fastqout_discarded_rev: Optional[str] = None
    opt_fastqout_orphans: Optional[str] = None
    opt_fastqout_orphans_rev: Optional[str] = None
    opt_fastqout_notmerged_fwd: Optional[str] = None
    opt_fastqout_notmerged_rev: Optional[str] = None
    opt_lcaout: Optional[str] = None
    opt_log: Optional[str] = None
    fp_log: Optional[object] = None  # open binary handle while --log active
    opt_matched: Optional[str] = None
    opt_mothur_shared_out: Optional[str] = None
    opt_msaout: Optional[str] = None
    opt_nonchimeras: Optional[str] = None
    opt_notmatched: Optional[str] = None
    opt_notmatchedfq: Optional[str] = None
    opt_otutabout: Optional[str] = None
    opt_output: Optional[str] = None
    opt_profile: Optional[str] = None
    opt_qsegout: Optional[str] = None
    opt_samout: Optional[str] = None
    opt_tabbedout: Optional[str] = None
    opt_tsegout: Optional[str] = None
    opt_uc: Optional[str] = None
    opt_uchimealns: Optional[str] = None
    opt_uchimeout: Optional[str] = None
    opt_userout: Optional[str] = None

    # label selection
    opt_label: Optional[str] = None
    opt_labels: Optional[str] = None
    opt_label_field: Optional[str] = None
    opt_label_word: Optional[str] = None
    opt_label_words: Optional[str] = None
    opt_label_suffix: Optional[str] = None
    opt_label_substr_match: bool = False
    opt_relabel: Optional[str] = None
    opt_relabel_keep: bool = False
    opt_relabel_md5: bool = False
    opt_relabel_self: bool = False
    opt_relabel_sha1: bool = False
    opt_sample: Optional[str] = None

    # misc inputs
    opt_reverse: Optional[str] = None
    opt_read_separators: Optional[str] = None
    # reference: vsearch.h:218-220,286-287 — Q40 pads at offsets 33/64
    opt_join_padgap: str = "NNNNNNNN"
    opt_join_padgapq: str = "IIIIIIII"
    opt_join_padgapq_set_by_user: bool = False

    # floating point options
    opt_abskew: float = 0.0
    opt_chimeras_diff_pct: float = 0.0
    opt_dn: float = 1.4
    opt_fastq_maxdiffpct: float = 100.0
    opt_fastq_maxee: float = DBL_MAX
    opt_fastq_maxee_rate: float = DBL_MAX
    opt_fastq_truncee: float = DBL_MAX
    opt_fastq_truncee_rate: float = DBL_MAX
    opt_id: float = -1.0
    opt_lca_cutoff: float = 1.0
    opt_max_unmasked_pct: float = 100.0
    opt_maxid: float = 1.0
    opt_maxqt: float = DBL_MAX
    opt_maxsizeratio: float = DBL_MAX
    opt_maxsl: float = DBL_MAX
    opt_mid: float = 0.0
    opt_min_unmasked_pct: float = 0.0
    opt_mindiv: float = 0.8
    opt_minh: float = 0.28
    opt_minqt: float = 0.0
    opt_minsizeratio: float = 0.0
    opt_minsl: float = 0.0
    opt_query_cov: float = 0.0
    opt_sample_pct: float = 0.0
    opt_sintax_cutoff: float = 0.0
    opt_target_cov: float = 0.0
    opt_unoise_alpha: float = 2.0
    opt_weak_id: float = 10.0
    opt_xn: float = 8.0

    # integer options
    opt_acceptall: int = 0
    opt_alignwidth: int = 80
    opt_chimeras_length_min: int = 10
    opt_chimeras_parents_max: int = 3
    opt_chimeras_parts: int = 0
    opt_cons_truncate: int = 0
    opt_fasta_width: int = DEFAULT_FASTA_WIDTH
    opt_fastq_ascii: int = DEFAULT_ASCII_OFFSET
    opt_fastq_asciiout: int = DEFAULT_ASCII_OFFSET
    opt_fastq_maxdiffs: int = 10
    opt_fastq_maxlen: int = INT64_MAX
    opt_fastq_maxmergelen: int = 1000000
    opt_fastq_maxns: int = INT64_MAX
    opt_fastq_minlen: int = 1
    opt_fastq_minmergelen: int = 0
    opt_fastq_minovlen: int = 10
    opt_fastq_minqual: int = 0
    opt_fastq_qmax: int = DEFAULT_MAX_QUALITY
    opt_fastq_qmaxout: int = DEFAULT_MAX_QUALITY
    opt_fastq_qmin: int = 0
    opt_fastq_qminout: int = 0
    opt_fastq_stripleft: int = 0
    opt_fastq_stripright: int = 0
    opt_fastq_tail: int = 4
    opt_fastq_trunclen: int = -1
    opt_fastq_trunclen_keep: int = -1
    opt_fastq_truncqual: int = INT64_MIN_LONG
    opt_fulldp: int = 0

    # gap penalties (reference: positive penalties; fixups subtract the
    # extension from the open once, src/vsearch.cc:249-258)
    opt_gap_extension_query_interior: int = 2
    opt_gap_extension_query_left: int = 1
    opt_gap_extension_query_right: int = 1
    opt_gap_extension_target_interior: int = 2
    opt_gap_extension_target_left: int = 1
    opt_gap_extension_target_right: int = 1
    opt_gap_open_query_interior: int = 20
    opt_gap_open_query_left: int = 2
    opt_gap_open_query_right: int = 2
    opt_gap_open_target_interior: int = 20
    opt_gap_open_target_left: int = 2
    opt_gap_open_target_right: int = 2
    # '*' (infinite) gap-penalty sentinels (src/vsearch.h:462-480)
    opt_gap_open_query_left_infinite: bool = False
    opt_gap_open_query_interior_infinite: bool = False
    opt_gap_open_query_right_infinite: bool = False
    opt_gap_open_target_left_infinite: bool = False
    opt_gap_open_target_interior_infinite: bool = False
    opt_gap_open_target_right_infinite: bool = False
    opt_gap_extension_query_left_infinite: bool = False
    opt_gap_extension_query_interior_infinite: bool = False
    opt_gap_extension_query_right_infinite: bool = False
    opt_gap_extension_target_left_infinite: bool = False
    opt_gap_extension_target_interior_infinite: bool = False
    opt_gap_extension_target_right_infinite: bool = False
    opt_gap_penalty_has_infinite: bool = False

    opt_iddef: int = 2
    opt_idprefix: int = 0
    opt_idsuffix: int = 0
    opt_leftjust: int = 0
    opt_length_cutoffs_increment: int = 50
    opt_length_cutoffs_longest: int = INT_MAX
    opt_length_cutoffs_shortest: int = 50
    opt_match: int = 2
    opt_maxaccepts: int = 1
    opt_maxdiffs: int = INT_MAX
    opt_maxgaps: int = INT_MAX
    opt_maxhits: int = 0
    opt_maxqsize: int = INT64_MAX
    opt_maxrejects: int = -1
    opt_maxseqlength: int = DEFAULT_MAXSEQLENGTH
    opt_maxsize: int = INT64_MAX
    opt_maxsubs: int = INT_MAX
    opt_maxuniquesize: int = INT64_MAX
    opt_mincols: int = 0
    opt_mindiffs: int = 3
    opt_minseqlength: int = -1
    opt_minsize: int = 0
    opt_mintsize: int = 0
    opt_minuniquesize: int = 1
    opt_minwordmatches: int = -1
    opt_mismatch: int = -4
    opt_output_no_hits: int = 0
    opt_randseed: int = 0
    opt_rightjust: int = 0
    opt_rowlen: int = 64
    opt_sample_size: int = 0
    opt_self: int = 0
    opt_selfid: int = 0
    opt_slots: int = 0
    opt_subseq_end: int = INT64_MAX
    opt_subseq_start: int = 1
    opt_threads: int = 0
    opt_top_hits_only: int = 0
    opt_topn: int = INT64_MAX
    opt_uchimeout5: int = 0
    opt_usersort: int = 0
    opt_wordlength: int = 0

    # masking
    opt_qmask: Masking = Masking.dust
    opt_dbmask: Masking = Masking.dust
    opt_hardmask: bool = False

    # boolean options
    opt_bzip2_decompress: bool = False
    opt_centroid_sizeout: bool = False
    opt_clusterout_id: bool = False
    opt_clusterout_sort: bool = False
    opt_eeout: bool = False
    opt_fasta_score: bool = False
    opt_fastq_allowmergestagger: bool = False
    opt_fastq_eeout: bool = False
    opt_fastq_nostagger: bool = True
    opt_fastq_qout_max: bool = False
    opt_gzip_decompress: bool = False
    opt_lengthout: bool = False
    opt_n_mismatch: bool = False
    opt_no_progress: bool = True
    opt_notrunclabels: bool = False
    opt_quiet: bool = True
    opt_samheader: bool = False
    opt_sff_clip: bool = False
    opt_sintax_random: bool = False
    opt_sizein: bool = False
    opt_sizeorder: bool = False
    opt_sizeout: bool = False
    opt_strand: bool = False
    opt_uc_allhits: bool = False
    opt_xee: bool = False
    opt_xlength: bool = False
    opt_xsize: bool = False

    opt_ee_cutoffs: List[float] = dataclasses.field(
        default_factory=lambda: [0.5, 1.0, 2.0])
    opt_userfields: List[int] = dataclasses.field(default_factory=list)

    # bookkeeping
    command_line: str = ""
    prog_header: str = ""
    gap_penalties_adjusted: bool = False

    def apply_defaults_fixups(self) -> None:
        """Sentinel resolution, mirror of vsearch_apply_defaults_fixups
        (reference: src/vsearch.cc:186-276)."""
        if self.opt_maxhits == 0:
            self.opt_maxhits = INT64_MAX

        if self.opt_minwordmatches < 0:
            if 0 <= self.opt_wordlength < len(MINWORDMATCHES_DEFAULTS):
                self.opt_minwordmatches = MINWORDMATCHES_DEFAULTS[self.opt_wordlength]
            else:
                self.opt_minwordmatches = 0

        if self.opt_id >= 0.0 and self.opt_weak_id > self.opt_id:
            self.opt_weak_id = self.opt_id

        if self.opt_threads < 0 or self.opt_threads > 1024:
            raise ValueError(
                "The argument to --threads must be in the range 0 (default) to 1024")
        if self.opt_threads == 0:
            self.opt_threads = os.cpu_count() or 1

        if self.opt_maxrejects == -1:
            self.opt_maxrejects = 32
        if self.opt_maxaccepts < 0:
            raise ValueError("The argument to --maxaccepts must not be negative")
        if self.opt_maxrejects < 0:
            raise ValueError("The argument to --maxrejects must not be negative")

        if self.opt_wordlength == 0:
            self.opt_wordlength = 8
        if self.opt_wordlength < 3 or self.opt_wordlength > 15:
            raise ValueError("The argument to --wordlength must be in the range 3 to 15")

        if self.opt_chimeras_parents_max < 2 or self.opt_chimeras_parents_max > MAXPARENTS:
            raise ValueError(
                "The argument to --chimeras_parents_max must be in the range 2 to %d"
                % MAXPARENTS)

        if not self.gap_penalties_adjusted:
            self.opt_gap_open_query_left -= self.opt_gap_extension_query_left
            self.opt_gap_open_target_left -= self.opt_gap_extension_target_left
            self.opt_gap_open_query_interior -= self.opt_gap_extension_query_interior
            self.opt_gap_open_target_interior -= self.opt_gap_extension_target_interior
            self.opt_gap_open_query_right -= self.opt_gap_extension_query_right
            self.opt_gap_open_target_right -= self.opt_gap_extension_target_right
            self.gap_penalties_adjusted = True

        self.opt_gap_penalty_has_infinite = (
            self.opt_gap_open_query_left_infinite
            or self.opt_gap_open_query_interior_infinite
            or self.opt_gap_open_query_right_infinite
            or self.opt_gap_open_target_left_infinite
            or self.opt_gap_open_target_interior_infinite
            or self.opt_gap_open_target_right_infinite
            or self.opt_gap_extension_query_left_infinite
            or self.opt_gap_extension_query_interior_infinite
            or self.opt_gap_extension_query_right_infinite
            or self.opt_gap_extension_target_left_infinite
            or self.opt_gap_extension_target_interior_infinite
            or self.opt_gap_extension_target_right_infinite)
