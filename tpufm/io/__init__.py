from tpufm.io.fasta import (
    read_reference,
    write_reference,
    load_queries,
    load_queries_varlen,
    load_query_names,
    load_query_quals,
)
from tpufm.io.results import write_results, load_results
from tpufm.io.genreads import generate_reads
from tpufm.io.contigs import ContigMap, read_contigs
from tpufm.io.bam import read_bam, sam_to_bam, write_bam
from tpufm.io.bam_index import (
    IndexedBam,
    flagstat,
    sort_sam_text,
    write_bam_indexed,
)

__all__ = [
    "read_bam",
    "sam_to_bam",
    "write_bam",
    "IndexedBam",
    "flagstat",
    "sort_sam_text",
    "write_bam_indexed",
    "read_reference",
    "write_reference",
    "load_queries",
    "load_queries_varlen",
    "load_query_names",
    "load_query_quals",
    "write_results",
    "load_results",
    "generate_reads",
    "ContigMap",
    "read_contigs",
]
