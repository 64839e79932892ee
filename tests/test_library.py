"""Library generation tests: JSON schema compatibility with the reference's
[Config, Data] format (reference: nimble/__main__.py:45-110, nimble/types.py)."""
import json
import os

from nimble_tpu.config import Config, Data, load_library, save_library
from nimble_tpu.library import generate, parse_csv, parse_fasta


FASTA = """>alleleA description text
ACGTACGTACGTACGTACGTAAAA
CCCCGGGG
>alleleB
TTTTACGTACGTACGTACGTACGT
"""

CSV_WITH_SEQ = """name,sequence,lineage
alleleA,ACGTACGTACGTACGTACGTAAAACCCCGGGG,L1
alleleB,TTTTACGTACGTACGTACGTACGT,L2
"""

CSV_META_ONLY = """name,lineage
alleleA,L1
alleleB,L2
"""


def write(tmp_path, name, content):
    p = os.path.join(tmp_path, name)
    with open(p, "w") as f:
        f.write(content)
    return p


def test_config_default_serialization_matches_reference_schema():
    d = Config().to_dict()
    assert d == {
        "score_threshold": 20,
        "score_filter": 25,
        "score_percent": 0.5,
        "num_mismatches": 0,
        "discard_multiple_matches": False,
        "intersect_level": 0,
        "group_on": "",
        "discard_multi_hits": 0,
        "require_valid_pair": False,
        "data_type": "RNA",
        "filters": [],
        "max_hits_to_report": 10,
        "trim_target_length": 50,
        "trim_strictness": 0.9,
    }


def test_parse_fasta(tmp_path):
    path = write(str(tmp_path), "my_lib.fasta", FASTA)
    data, config = parse_fasta(path)
    assert data.headers == ["reference_genome", "sequence_name", "nt_length", "sequence"]
    assert data.column("reference_genome") == ["my lib", "my lib"]
    assert data.sequence_names == ["alleleA", "alleleB"]
    assert data.column("nt_length") == ["32", "24"]
    assert data.sequences[0] == "ACGTACGTACGTACGTACGTAAAACCCCGGGG"
    assert config.score_threshold == 20


def test_parse_csv_with_sequences(tmp_path):
    path = write(str(tmp_path), "lib.csv", CSV_WITH_SEQ)
    data, _ = parse_csv(path, has_sequences=True)
    assert data.headers == [
        "reference_genome",
        "sequence_name",
        "nt_length",
        "sequence",
        "lineage",
    ]
    assert data.column("lineage") == ["L1", "L2"]
    assert data.column("nt_length") == ["32", "24"]


def test_generate_lone_fasta_roundtrip(tmp_path):
    fasta = write(str(tmp_path), "my_lib.fasta", FASTA)
    out = os.path.join(str(tmp_path), "library.json")
    generate(fasta, None, out)

    with open(out) as f:
        raw = json.load(f)
    assert isinstance(raw, list) and len(raw) == 2
    assert raw[0]["score_threshold"] == 20
    assert raw[1]["headers"][:4] == [
        "reference_genome",
        "sequence_name",
        "nt_length",
        "sequence",
    ]

    config, data = load_library(out)
    assert data.sequence_names == ["alleleA", "alleleB"]


def test_generate_fasta_plus_metadata_csv(tmp_path):
    fasta = write(str(tmp_path), "my_lib.fasta", FASTA)
    csvp = write(str(tmp_path), "meta.csv", CSV_META_ONLY)
    out = os.path.join(str(tmp_path), "library.json")
    generate(fasta, csvp, out)
    config, data = load_library(out)
    assert "lineage" in data.headers
    # sequences from the FASTA were joined into the CSV metadata rows
    idx = data.sequence_names.index("alleleA")
    assert data.sequences[idx] == "ACGTACGTACGTACGTACGTAAAACCCCGGGG"
    assert data.column("lineage")[idx] == "L1"


def test_library_save_load_roundtrip(tmp_path):
    cfg = Config(score_threshold=42, group_on="lineage")
    data = Data()
    data.columns[0].append("lib")
    data.columns[1].append("seq1")
    data.columns[2].append("4")
    data.columns[3].append("ACGT")
    path = os.path.join(str(tmp_path), "lib.json")
    save_library(path, cfg, data)
    cfg2, data2 = load_library(path)
    assert cfg2.score_threshold == 42
    assert cfg2.group_on == "lineage"
    assert data2.sequences == ["ACGT"]
