"""Sample x OTU abundance table (reference: src/core/otutable.cpp)."""

from __future__ import annotations

import re
from datetime import datetime
from typing import IO, Dict, Optional, Tuple

from ..params import Parameters

_RE_SAMPLE = re.compile(rb"(^|;)(sample|barcodelabel)=([^;]*)($|;)")
_RE_OTU = re.compile(rb"(^|;)otu=([^;]*)($|;)")
_RE_TAX = re.compile(rb"(^|;)tax=([^;]*)($|;)")
_NAME_CHARS = (b"ABCDEFGHIJKLMNOPQRSTUVWXYZ"
               b"abcdefghijklmnopqrstuvwxyz_0123456789")


def _strspn(data: bytes, accept: bytes) -> int:
    n = 0
    for b in data:
        if b not in accept:
            break
        n += 1
    return n


class OtuTable:
    def __init__(self) -> None:
        self.otu_set = set()
        self.sample_set = set()
        self.sample_otu_count: Dict[Tuple[bytes, bytes], int] = {}
        self.otu_sample_count: Dict[Tuple[bytes, bytes], int] = {}
        self.otu_tax_map: Dict[bytes, bytes] = {}

    def add(self, query_header: Optional[bytes],
            target_header: Optional[bytes], abundance: int) -> None:
        """reference: otutable.cpp otutable_add (:175-295)."""
        sample_name = None
        if query_header is not None:
            m = _RE_SAMPLE.search(query_header)
            if m:
                sample_name = m.group(3)
            else:
                sample_name = query_header[:_strspn(query_header, _NAME_CHARS)]

        otu_name = None
        if target_header is not None:
            m = _RE_OTU.search(target_header)
            if m:
                otu_name = m.group(2)
            else:
                semi = target_header.find(b";")
                otu_name = target_header if semi < 0 else target_header[:semi]
            m = _RE_TAX.search(target_header)
            if m:
                self.otu_tax_map[otu_name] = m.group(2)

        # note: the reference inserts even empty names' C-strings; an empty
        # match produces the empty string which std::set keeps — replicate
        if sample_name is not None:
            self.sample_set.add(sample_name)
        if otu_name is not None:
            self.otu_set.add(otu_name)
        if sample_name is not None and otu_name is not None and abundance != 0:
            key_so = (sample_name, otu_name)
            key_os = (otu_name, sample_name)
            self.sample_otu_count[key_so] = \
                self.sample_otu_count.get(key_so, 0) + abundance
            self.otu_sample_count[key_os] = \
                self.otu_sample_count.get(key_os, 0) + abundance

    def print_otutabout(self, out: IO[bytes], params: Parameters) -> None:
        """reference: otutable.cpp:298-356"""
        otus = sorted(self.otu_set)
        samples = sorted(self.sample_set)
        out.write(b"#OTU ID")
        for s in samples:
            out.write(b"\t" + s)
        if self.otu_tax_map:
            out.write(b"\ttaxonomy")
        out.write(b"\n")
        for otu in otus:
            out.write(otu)
            for s in samples:
                out.write(b"\t%d" % self.otu_sample_count.get((otu, s), 0))
            if self.otu_tax_map:
                out.write(b"\t" + self.otu_tax_map.get(otu, b""))
            out.write(b"\n")

    def print_mothur_shared_out(self, out: IO[bytes],
                                params: Parameters) -> None:
        """reference: otutable.cpp:359-401"""
        otus = sorted(self.otu_set)
        samples = sorted(self.sample_set)
        out.write(b"label\tGroup\tnumOtus")
        for otu in otus:
            out.write(b"\t" + otu)
        out.write(b"\n")
        for s in samples:
            out.write(b"vsearch\t%s\t%d" % (s, len(otus)))
            for otu in otus:
                out.write(b"\t%d" % self.sample_otu_count.get((s, otu), 0))
            out.write(b"\n")

    def print_biomout(self, out: IO[bytes], params: Parameters) -> None:
        """reference: otutable.cpp:404-495"""
        otus = sorted(self.otu_set)
        samples = sorted(self.sample_set)
        date = datetime.now().astimezone().strftime("%Y-%m-%dT%H:%M:%S")
        out.write(b"{\n")
        out.write(b'\t"id":"%s",\n' % (params.opt_biomout or "").encode())
        out.write(b'\t"format": "Biological Observation Matrix 1.0",\n')
        out.write(b'\t"format_url": "http://biom-format.org/documentation/'
                  b'format_versions/biom-1.0.html",\n')
        out.write(b'\t"type": "OTU table",\n')
        out.write(b'\t"generated_by": "vsearch 2.31.0",\n')
        out.write(b'\t"date": "%s",\n' % date.encode())
        out.write(b'\t"matrix_type": "sparse",\n')
        out.write(b'\t"matrix_element_type": "int",\n')
        out.write(b'\t"shape": [%d,%d],\n' % (len(otus), len(samples)))
        out.write(b'\t"rows":[')
        for i, otu in enumerate(otus):
            if i:
                out.write(b",")
            out.write(b'\n\t\t{"id":"%s", "metadata":' % otu)
            if not self.otu_tax_map:
                out.write(b"null")
            else:
                out.write(b'{"taxonomy":"%s"}' % self.otu_tax_map.get(otu, b""))
            out.write(b"}")
        out.write(b"\n\t],\n")
        out.write(b'\t"columns":[')
        for i, s in enumerate(samples):
            if i:
                out.write(b",")
            out.write(b'\n\t\t{"id":"%s", "metadata":null}' % s)
        out.write(b"\n\t],\n")
        out.write(b'\t"data": [')
        first = True
        otu_no = {o: i for i, o in enumerate(otus)}
        sample_no = {s: i for i, s in enumerate(samples)}
        for (otu, s) in sorted(self.otu_sample_count):
            if not first:
                out.write(b",")
            out.write(b"\n\t\t[%d,%d,%d]" % (
                otu_no[otu], sample_no[s], self.otu_sample_count[(otu, s)]))
            first = False
        out.write(b"\n\t]\n")
        out.write(b"}\n")
