"""Command-line interface mirroring the reference's option surface.

reference: src/cli.cc (254 long options, enum-indexed table, per-command
permitted-option handling) and src/vsearch.cc dispatch_command.  Options are
declared in a table (name -> Parameters field + type) and parsed getopt_long
style: every option takes a required argument except the flag set below.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional

from .params import INT64_MAX, Masking, Parameters

PROG_NAME = "vsearch"
PROG_VERSION = "v2.31.0_tpu"

# commands (option name == Parameters field suffix)
COMMANDS = [
    "allpairs_global", "chimeras_denovo", "cluster_fast", "cluster_size",
    "cluster_smallmem", "cluster_unoise", "cut", "derep_fulllength",
    "derep_id", "derep_prefix", "derep_smallmem", "fasta2fastq",
    "fastq_chars", "fastq_convert", "fastq_eestats", "fastq_eestats2",
    "fastq_filter", "fastq_join", "fastq_mergepairs", "fastq_stats",
    "fastx_filter", "fastx_getseq", "fastx_getseqs", "fastx_getsubseq",
    "fastx_mask", "fastx_revcomp", "fastx_subsample", "fastx_syncpairs",
    "fastx_uniques", "makeudb_usearch", "maskfasta", "orient", "rereplicate",
    "search_exact", "sff_convert", "shuffle", "sintax", "sortbylength",
    "sortbysize", "uchime2_denovo", "uchime3_denovo", "uchime_denovo",
    "uchime_ref", "udb2fasta", "udbinfo", "udbstats", "usearch_global",
]

# options whose Parameters field takes the raw string
STR_OPTS = [
    "alnout", "biomout", "blast6out", "borderline", "centroids", "chimeras",
    "clusters", "consout", "db", "dbmatched", "dbnotmatched", "eetabbedout",
    "fastaout", "fastaout_discarded", "fastaout_discarded_rev",
    "fastaout_notmerged_fwd", "fastaout_notmerged_rev", "fastaout_rev",
    "fastapairs", "fastqout", "fastqout_discarded", "fastqout_discarded_rev",
    "fastqout_notmerged_fwd", "fastqout_notmerged_rev", "fastqout_rev",
    "label", "label_field", "label_suffix", "label_word", "label_words",
    "labels", "lcaout", "log", "matched", "mothur_shared_out", "msaout",
    "nonchimeras", "notmatched", "notmatchedfq", "otutabout", "output",
    "profile", "qsegout", "relabel", "reverse", "sample", "samout",
    "tabbedout", "tsegout", "uc", "uchimealns", "uchimeout", "userout",
    "cut_pattern", "join_padgap", "join_padgapq", "read_separators",
    "fastaout_orphans", "fastaout_orphans_rev", "fastqout_orphans",
    "fastqout_orphans_rev", "pattern",
]

INT_OPTS = [
    "alignwidth", "chimeras_length_min", "chimeras_parents_max",
    "chimeras_parts", "cons_truncate", "fasta_width", "fastq_ascii",
    "fastq_asciiout", "fastq_maxdiffs", "fastq_maxlen", "fastq_maxmergelen",
    "fastq_maxns", "fastq_minlen", "fastq_minmergelen", "fastq_minovlen",
    "fastq_minqual", "fastq_qmax", "fastq_qmaxout", "fastq_qmin",
    "fastq_qminout", "fastq_stripleft", "fastq_stripright", "fastq_tail",
    "fastq_trunclen", "fastq_trunclen_keep", "fastq_truncqual", "fulldp",
    "iddef", "idprefix", "idsuffix", "length_cutoffs_increment",
    "length_cutoffs_longest", "length_cutoffs_shortest", "match",
    "maxaccepts", "maxdiffs", "maxgaps", "maxhits", "maxqsize",
    "maxrejects", "maxseqlength", "maxsize", "maxsubs", "maxuniquesize",
    "mincols", "mindiffs", "minseqlength", "minsize", "mintsize",
    "minuniquesize", "minwordmatches", "mismatch", "randseed", "rowlen",
    "sample_size", "slots", "subseq_end", "subseq_start", "threads", "topn",
    "uchimeout5", "wordlength",
]

FLOAT_OPTS = [
    "abskew", "chimeras_diff_pct", "dn", "fastq_maxdiffpct", "fastq_maxee",
    "fastq_maxee_rate", "fastq_truncee", "fastq_truncee_rate", "id",
    "lca_cutoff", "max_unmasked_pct", "maxid", "maxqt", "maxsizeratio",
    "maxsl", "mid", "min_unmasked_pct", "mindiv", "minh", "minqt",
    "minsizeratio", "minsl", "query_cov", "sample_pct", "sintax_cutoff",
    "target_cov", "unoise_alpha", "weak_id", "xn",
]

FLAG_OPTS = [
    "bzip2_decompress", "centroid_sizeout", "clusterout_id",
    "clusterout_sort", "eeout", "fasta_score", "fastq_allowmergestagger",
    "fastq_eeout", "fastq_nostagger", "fastq_qout_max", "gzip_decompress",
    "hardmask", "label_substr_match", "lengthout", "n_mismatch",
    "no_progress", "notrunclabels", "quiet", "relabel_keep", "relabel_md5",
    "relabel_self", "relabel_sha1", "samheader", "sff_clip", "sintax_random",
    "sizein", "sizeorder", "sizeout", "uc_allhits", "xee", "xlength",
    "xsize", "acceptall", "leftjust", "rightjust", "output_no_hits",
    "self", "selfid", "top_hits_only", "usersort",
]
# reference: these int64 "flag" options are plain no-argument toggles in the
# CLI (cli.cc option table second column = false)
_INT_FLAGS = {"acceptall", "leftjust", "rightjust", "output_no_hits", "self",
              "selfid", "top_hits_only", "usersort"}


class CliError(Exception):
    pass


def parse_gap_penalty_string(arg: str, is_open: bool,
                             params: Parameters) -> None:
    """reference: cli.cc args_get_gap_penalty_string (:179-330)."""
    max_gap_penalty = 32767 // 5
    cursor = 0
    prefix = "gap_open" if is_open else "gap_extension"
    while cursor < len(arg):
        is_infinite = False
        num = ""
        while cursor < len(arg) and (arg[cursor].isdigit()
                                     or (arg[cursor] == "-" and not num)):
            num += arg[cursor]
            cursor += 1
        if num:
            pen = int(num)
            if pen < 0 or pen > max_gap_penalty:
                raise CliError(
                    "A finite gap penalty must be in the range 0 to %d; "
                    "use '*' to declare an infinite penalty" % max_gap_penalty)
        elif cursor < len(arg) and arg[cursor] == "*":
            pen = 2**31 - 1
            is_infinite = True
            cursor += 1
        else:
            raise CliError("Invalid gap penalty argument (%s)" % arg[cursor:])

        set_E = set_I = set_L = set_R = set_Q = set_T = False
        while cursor < len(arg) and arg[cursor] != "/":
            c = arg[cursor]
            if c == "E":
                set_E = True
            elif c == "I":
                set_I = True
            elif c == "L":
                set_L = True
            elif c == "R":
                set_R = True
            elif c == "Q":
                set_Q = True
            elif c == "T":
                set_T = True
            else:
                raise CliError("Invalid char '%s' in gap penalty string" % c)
            cursor += 1
        if cursor < len(arg) and arg[cursor] == "/":
            cursor += 1
        if set_E and (set_L or set_R):
            raise CliError("Invalid gap penalty string (E and L or R)")
        if set_E:
            set_L = set_R = True
        if not (set_L or set_I or set_R):
            set_L = set_I = set_R = True
        if not (set_Q or set_T):
            set_Q = set_T = True
        for qt, enabled_qt in (("query", set_Q), ("target", set_T)):
            if not enabled_qt:
                continue
            for pos, enabled in (("left", set_L), ("interior", set_I),
                                 ("right", set_R)):
                if not enabled:
                    continue
                setattr(params, "opt_%s_%s_%s" % (prefix, qt, pos), pen)
                setattr(params, "opt_%s_%s_%s_infinite" % (prefix, qt, pos),
                        is_infinite)


# the tool this framework reimplements; shown by --version/--help
# (reference: vsearch.cc show_publication)
_PUBLICATION = (
    "Rognes T, Flouri T, Nichols B, Quince C, Mahe F (2016)\n"
    "VSEARCH: a versatile open source tool for metagenomics\n"
    "PeerJ 4:e2584 doi: 10.7717/peerj.2584 "
    "https://doi.org/10.7717/peerj.2584\n\n")


def _prog_header() -> str:
    """reference: vsearch.cc fill_prog_header (:544-556) —
    "<name> v<ver>_<arch>, <ram>GB RAM, <n> cores"."""
    import os
    try:
        pages = os.sysconf("SC_PHYS_PAGES")
        pagesize = os.sysconf("SC_PAGE_SIZE")
        ram_gb = pages * pagesize / (1024.0 ** 3)
    except (ValueError, OSError):
        ram_gb = 0.0
    cores = os.cpu_count() or 1
    return ("%s %s_linux_x86_64, %.1fGB RAM, %d cores"
            % (PROG_NAME, PROG_VERSION, ram_gb, cores))


def show_header(params: Parameters) -> None:
    """reference: vsearch.cc show_header (:573-578)."""
    if params.opt_quiet:
        return
    sys.stderr.write("%s\n" % params.prog_header)
    sys.stderr.write("https://github.com/torognes/vsearch\n")
    sys.stderr.write("\n")


def parse_args(argv: List[str]) -> Parameters:
    params = Parameters()
    params.opt_quiet = False
    params.opt_no_progress = not sys.stderr.isatty()
    params.command_line = " ".join([PROG_NAME] + argv)
    params.prog_header = _prog_header()

    command: Optional[str] = None
    option_seen: Dict[str, bool] = {}

    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise CliError("Unrecognized argument: %s" % arg)
        name = arg[2:]
        option_seen[name] = True

        def take_value() -> str:
            nonlocal i
            i += 1
            if i >= len(argv):
                raise CliError("Option --%s requires an argument" % name)
            return argv[i]

        if name in COMMANDS:
            if command is not None:
                raise CliError("Two commands specified")
            command = name
            setattr(params, "opt_" + name, take_value())
        elif name in ("help", "h"):
            command = "help"
        elif name in ("version", "v"):
            command = "version"
        elif name in ("band", "hspw", "minhsp", "xdrop_nw"):
            # legacy usearch options, accepted but ignored
            # (reference: cli.cc:3668-3686)
            take_value()
            sys.stderr.write("WARNING: Option --%s is ignored\n" % name)
        elif name == "gapopen":
            parse_gap_penalty_string(take_value(), True, params)
        elif name == "gapext":
            parse_gap_penalty_string(take_value(), False, params)
        elif name == "strand":
            v = take_value()
            if v == "plus":
                params.opt_strand = False
            elif v == "both":
                params.opt_strand = True
            else:
                raise CliError(
                    "The argument to --strand must be plus or both")
        elif name in ("qmask", "dbmask"):
            v = take_value()
            try:
                masking = Masking[v]
            except KeyError:
                raise CliError("Invalid masking mode %s" % v)
            setattr(params, "opt_" + name, masking)
        elif name == "userfields":
            from .core.results import parse_userfields
            params.opt_userfields = parse_userfields(take_value())
        elif name == "ee_cutoffs":
            params.opt_ee_cutoffs = [float(x) for x in take_value().split(",")]
        elif name == "length_cutoffs":
            # reference: cli.cc args_get_length_cutoffs (:126-160) —
            # "shortest,longest,increment" with '*' for unbounded longest
            parts = take_value().split(",")
            if len(parts) != 3:
                raise CliError("Invalid arguments to length_cutoffs")
            try:
                params.opt_length_cutoffs_shortest = int(parts[0])
                params.opt_length_cutoffs_longest = (
                    2**31 - 1 if parts[1] == "*" else int(parts[1]))
                params.opt_length_cutoffs_increment = int(parts[2])
            except ValueError:
                raise CliError("Invalid arguments to length_cutoffs")
            if (params.opt_length_cutoffs_shortest < 1
                    or params.opt_length_cutoffs_shortest
                    > params.opt_length_cutoffs_longest
                    or params.opt_length_cutoffs_increment < 1):
                raise CliError("Invalid arguments to length_cutoffs")
        elif name in STR_OPTS:
            setattr(params, "opt_" + name, take_value())
            if name == "join_padgapq":
                # reference: cli.cc:3800-3802
                params.opt_join_padgapq_set_by_user = True
        elif name in INT_OPTS:
            setattr(params, "opt_" + name, int(take_value()))
        elif name in FLOAT_OPTS:
            setattr(params, "opt_" + name, float(take_value()))
        elif name in FLAG_OPTS:
            if name in _INT_FLAGS:
                setattr(params, "opt_" + name, 1)
            else:
                setattr(params, "opt_" + name, True)
        else:
            raise CliError("Unknown option: --%s" % name)
        i += 1

    if command is None:
        raise CliError("No command specified")
    params._command = command  # type: ignore[attr-defined]
    apply_command_defaults(option_seen, params)
    return params


def apply_command_defaults(option_seen: Dict[str, bool],
                           params: Parameters) -> None:
    """reference: cli.cc apply_command_defaults (:4451-4522), preceded by the
    co-dependent defaults of validate_option_values (cli.cc:4150-4201) which
    run before the fixups: weak_id (0.90 for unoise, else clamped to opt_id
    even when id is unset), maxrejects (8 for cluster_fast), wordlength."""
    if params.opt_cluster_unoise is not None:
        params.opt_weak_id = 0.90
    elif params.opt_weak_id > params.opt_id:
        params.opt_weak_id = params.opt_id
    if params.opt_maxrejects == -1:
        params.opt_maxrejects = 8 if params.opt_cluster_fast is not None \
            else 32
    if params.opt_wordlength == 0:
        params.opt_wordlength = 12 if params.opt_orient is not None else 8
    params.apply_defaults_fixups()

    if params.opt_minsize == 0:
        params.opt_minsize = 8 if params.opt_cluster_unoise is not None else 1

    # chimeras_denovo narrows the default alignment width (cli.cc:4441-4448)
    if (params.opt_chimeras_denovo is not None
            and not option_seen.get("alignwidth")):
        params.opt_alignwidth = 60

    if not option_seen.get("abskew"):
        if params.opt_chimeras_denovo is not None:
            params.opt_abskew = 1.0
        elif params.opt_uchime3_denovo is not None:
            params.opt_abskew = 16.0
        else:
            params.opt_abskew = 2.0

    if params.opt_minseqlength < 0:
        if any(getattr(params, "opt_" + c) is not None for c in (
                "cluster_fast", "cluster_size", "cluster_smallmem",
                "cluster_unoise", "derep_fulllength", "derep_id",
                "derep_prefix", "makeudb_usearch", "sintax",
                "usearch_global")):
            params.opt_minseqlength = 32
        else:
            params.opt_minseqlength = 1

    if params.opt_sintax is not None:
        params.opt_notrunclabels = True


def dispatch(params: Parameters) -> None:
    """reference: vsearch.cc dispatch_command (:607-800)."""
    command = params._command  # type: ignore[attr-defined]
    if command == "version":
        # reference: vsearch.cc cmd_version → show_publication + build info
        if not params.opt_quiet:
            sys.stdout.write(_PUBLICATION)
            sys.stdout.write(
                "TPU-native reimplementation (JAX/XLA/Pallas); gzip and "
                "bzip2 compressed files supported.\n")
        return
    if command == "help":
        # reference: commands/help.cpp help() — publication, usage, then the
        # option surface.  Ours is generated from the live option tables.
        if not params.opt_quiet:
            sys.stdout.write(_PUBLICATION)
            sys.stdout.write("Usage: %s [OPTIONS]\n\n" % PROG_NAME)
            sys.stdout.write("Commands (exactly one per invocation):\n")
            for cmd in COMMANDS:
                sys.stdout.write("  --%s FILENAME\n" % cmd)
            sys.stdout.write("  --help | --version\n\n")
            sys.stdout.write("Options (reference-compatible surface):\n")
            names = sorted(set(STR_OPTS + INT_OPTS + FLOAT_OPTS + FLAG_OPTS)
                           | {"strand", "userfields", "gapopen", "gapext",
                              "qmask", "dbmask", "ee_cutoffs",
                              "length_cutoffs"})
            col = 0
            for name in names:
                tok = "--" + name
                if col + len(tok) + 1 > 78:
                    sys.stdout.write("\n")
                    col = 0
                sys.stdout.write(" " + tok)
                col += len(tok) + 1
            sys.stdout.write("\n\nSee the vsearch manual for option "
                             "semantics; this implementation mirrors them.\n")
        return
    if command == "allpairs_global":
        # reference: dispatch forces single strand + uc_allhits
        # (vsearch.cc:613-617)
        params.opt_strand = False
        params.opt_uc_allhits = True
        from .commands.allpairs import allpairs_global
        allpairs_global(params)
        return
    if command == "usearch_global":
        from .commands.usearch_global import usearch_global
        usearch_global(params)
    elif command in ("derep_fulllength", "derep_id", "fastx_uniques"):
        from .commands.derep import derep
        derep(params, command)
    elif command == "derep_prefix":
        from .commands.derep import derep_prefix
        derep_prefix(params)
    elif command == "derep_smallmem":
        from .commands.derep import derep_smallmem
        derep_smallmem(params)
    elif command == "sortbysize":
        from .commands.sort import sortbysize
        sortbysize(params)
    elif command == "sortbylength":
        from .commands.sort import sortbylength
        sortbylength(params)
    elif command == "shuffle":
        from .commands.sort import shuffle
        shuffle(params)
    elif command in ("cluster_fast", "cluster_size", "cluster_smallmem",
                     "cluster_unoise"):
        from .commands.cluster import cluster_command
        cluster_command(params, command)
    elif command in ("uchime_denovo", "uchime2_denovo", "uchime3_denovo",
                     "uchime_ref", "chimeras_denovo"):
        from .commands.chimera import chimera_command
        chimera_command(params, command)
    elif command == "fastq_mergepairs":
        from .commands.mergepairs import fastq_mergepairs
        fastq_mergepairs(params)
    elif command in ("fastq_filter", "fastx_filter"):
        from .commands.filter import filter_command
        filter_command(params, command)
    elif command == "search_exact":
        from .commands.search_exact import search_exact
        search_exact(params)
    elif command == "fastx_mask":
        from .commands.fastx_ops import fastx_mask
        fastx_mask(params)
    elif command == "maskfasta":
        from .commands.fastx_ops import maskfasta
        maskfasta(params)
    elif command == "fastx_revcomp":
        from .commands.fastx_ops import fastx_revcomp
        fastx_revcomp(params)
    elif command == "fastx_subsample":
        from .commands.fastx_ops import fastx_subsample
        fastx_subsample(params)
    elif command == "rereplicate":
        from .commands.fastx_ops import rereplicate
        # reference: dispatch forces xsize for rereplicate (vsearch.cc:737)
        params.opt_xsize = True
        rereplicate(params)
    elif command == "sintax":
        from .commands.sintax import sintax
        sintax(params)
    elif command == "orient":
        from .commands.orient import orient
        orient(params)
    elif command == "fastq_convert":
        from .commands.convert import fastq_convert
        fastq_convert(params)
    elif command == "fasta2fastq":
        from .commands.convert import fasta2fastq
        fasta2fastq(params)
    elif command == "fastq_join":
        from .commands.convert import fastq_join
        fastq_join(params)
    elif command == "fastx_syncpairs":
        from .commands.convert import fastx_syncpairs
        fastx_syncpairs(params)
    elif command == "fastq_chars":
        from .commands.stats import fastq_chars
        fastq_chars(params)
    elif command == "fastq_stats":
        from .commands.stats import fastq_stats
        fastq_stats(params)
    elif command == "fastq_eestats":
        from .commands.stats import fastq_eestats
        fastq_eestats(params)
    elif command == "fastq_eestats2":
        from .commands.stats import fastq_eestats2
        fastq_eestats2(params)
    elif command in ("fastx_getseq", "fastx_getseqs", "fastx_getsubseq"):
        from .commands.getseq import getseq
        getseq(params, command)
    elif command == "cut":
        from .commands.cut import cut
        cut(params)
    elif command == "sff_convert":
        from .commands.sff import sff_convert
        sff_convert(params)
    elif command == "makeudb_usearch":
        from .commands.udb_cmds import makeudb_usearch
        makeudb_usearch(params)
    elif command == "udb2fasta":
        from .commands.udb_cmds import udb2fasta
        udb2fasta(params)
    elif command == "udbinfo":
        from .commands.udb_cmds import udbinfo
        udbinfo(params)
    elif command == "udbstats":
        from .commands.udb_cmds import udbstats
        udbstats(params)
    else:
        raise CliError("Command %s not implemented yet" % command)


def main(argv: Optional[List[str]] = None) -> int:
    import os
    # persistent XLA compile cache: kernel geometries are bucketed, so a few
    # compiles amortize across runs
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/vsearch_tpu/jax"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    if argv is None:
        argv = sys.argv[1:]
    try:
        params = parse_args(argv)
        show_header(params)
        fp_log = None
        if params.opt_log is not None:
            # reference: utils/logfile.cpp LogFile — header, Started/Finished
            # timestamps, elapsed time and peak memory bracket the report
            import resource
            import time
            fp_log = open(params.opt_log, "wb")
            params.fp_log = fp_log
            stamp = time.strftime("%Y-%m-%dT%H:%M:%S")
            fp_log.write(params.prog_header.encode() + b"\n")
            fp_log.write(params.command_line.encode() + b"\n")
            fp_log.write(b"Started  %s\n" % stamp.encode())
            t0 = time.monotonic()
        try:
            dispatch(params)
        finally:
            if fp_log is not None:
                dt = time.monotonic() - t0
                stamp = time.strftime("%Y-%m-%dT%H:%M:%S")
                fp_log.write(b"\nFinished %s\n" % stamp.encode())
                fp_log.write(b"Elapsed time %02.0f:%02.0f\n"
                             % (dt // 60, dt % 60))
                maxmem = resource.getrusage(
                    resource.RUSAGE_SELF).ru_maxrss / 1024.0
                if maxmem < 1024.0:
                    fp_log.write(b"Max memory %.1fMB\n" % maxmem)
                else:
                    fp_log.write(b"Max memory %.1fGB\n" % (maxmem / 1024.0))
                fp_log.close()
    except (CliError, ValueError, OSError) as exc:
        # reference: utils/fatal.cpp — "Fatal error: <message>", exit 1
        print("Fatal error: %s" % exc, file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
