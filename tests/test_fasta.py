import gzip

from rawhash_tpu.io.fasta import read_fasta


def test_fasta_multiline(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">s1 desc\nACGT\nACGT\n>s2\nTTTT\n")
    recs = list(read_fasta(str(p)))
    assert recs == [("s1", "ACGTACGT"), ("s2", "TTTT")]


def test_fasta_gzip(tmp_path):
    p = tmp_path / "x.fa.gz"
    with gzip.open(p, "wt") as fp:
        fp.write(">a\nACGT\n")
    assert list(read_fasta(str(p))) == [("a", "ACGT")]


def test_fastq(tmp_path):
    p = tmp_path / "x.fq"
    p.write_text("@r1\nACGT\n+\nIIII\n@r2\nGGGG\n+\nIIII\n")
    assert list(read_fasta(str(p))) == [("r1", "ACGT"), ("r2", "GGGG")]
