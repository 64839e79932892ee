"""Library generation: FASTA/CSV -> [Config, Data] JSON.

Byte-compatible with the reference's `generate` subcommand (reference:
nimble/__main__.py:45-110, nimble/parse.py:15-139): a lone FASTA produces a
simple library; a lone CSV must carry a `sequence` column (literal sequence or
a genbank:// link); a CSV+FASTA pair joins FASTA sequences into CSV metadata
rows by sequence name. All CSV columns other than `name`/`sequence` are copied
verbatim as metadata columns (the `group_on` targets).
"""
from __future__ import annotations

import csv
import pathlib
import sys
from typing import List, Optional, Tuple

from nimble_tpu.config import Config, Data, save_library


def get_library_name_from_filename(seq_path: str) -> str:
    """Prettified filename used as reference_genome (reference: utils.py:31-32)."""
    return pathlib.Path(seq_path).stem.replace("_", " ")


def trim_low_complexity_regions(seq: str) -> str:
    """Passthrough, matching the reference no-op (reference: utils.py:116-117)."""
    return seq


def parse_fasta(seq_path: str) -> Tuple[Data, Config]:
    """FASTA -> (Data, Config) (reference: parse.py:15-35)."""
    from nimble_tpu.io.fasta import iter_fasta

    data = Data()
    config = Config()
    reference_name = get_library_name_from_filename(seq_path)
    for record_id, sequence in iter_fasta(seq_path):
        data.columns[0].append(reference_name)
        data.columns[1].append(record_id if record_id is not None else "null")
        data.columns[2].append(str(len(sequence)))
        data.columns[3].append(trim_low_complexity_regions(sequence))
    return data, config


def parse_csv(csv_path: str, has_sequences: bool = True) -> Tuple[Data, Config]:
    """CSV -> (Data, Config) (reference: parse.py:78-139).

    Required columns: `name` (+ `sequence` when has_sequences). The sequence
    cell may be a literal sequence or `genbank://<term>[:<start-end>]`, which
    is resolved via NCBI Entrez (requires network; reference: remote.py).
    Remaining columns are copied in order as metadata columns.
    """
    data = Data()
    config = Config()

    reference_genome = get_library_name_from_filename(csv_path)
    reference_genomes: List[str] = []
    sequence_names: List[str] = []
    nt_lengths: List[str] = []
    sequences: List[str] = []
    metadata: List[List[str]] = []

    with open(csv_path, newline="") as f:
        reader = csv.reader(f, delimiter=",", quotechar='"')
        headers = next(reader)

        sequence_idx = headers.index("sequence") if has_sequences else None
        names_idx = headers.index("name")

        # Headers are copied to the output library, so drop name/sequence.
        headers.pop(names_idx)
        if has_sequences and names_idx < sequence_idx:
            sequence_idx -= 1
        if has_sequences:
            headers.pop(sequence_idx)

        for row in reader:
            sequence_names.append(row.pop(names_idx))
            reference_genomes.append(reference_genome)

            if has_sequences:
                raw_seq = row.pop(sequence_idx)
                if "genbank://" in raw_seq:
                    from nimble_tpu.remote import resolve_genbank

                    nt_length, sequence = resolve_genbank(raw_seq)
                    nt_lengths.append(str(nt_length))
                    sequences.append(sequence)
                else:
                    sequences.append(raw_seq)
                    nt_lengths.append(str(len(raw_seq)))

            if len(metadata) == 0:
                metadata = [[] for _ in range(len(headers))]
            for i, col in enumerate(row):
                metadata[i].append(col)

    data.headers.extend(headers)
    data.columns = [
        reference_genomes,
        sequence_names,
        nt_lengths,
        [trim_low_complexity_regions(s) for s in sequences],
    ]
    data.columns.extend(metadata)
    return data, config


def _process_file(file: Optional[str], paired_file: Optional[str]):
    """Dispatch by suffix (reference: __main__.py:70-85)."""
    data = None
    config = None
    is_csv = False
    if file:
        suffix = pathlib.Path(file).suffix
        if suffix == ".fasta":
            data, config = parse_fasta(file)
        elif suffix == ".csv" and paired_file:
            data, config = parse_csv(file, has_sequences=False)
            is_csv = True
        elif suffix == ".csv" and not paired_file:
            data, config = parse_csv(file, has_sequences=True)
            is_csv = True
    return data, config, is_csv


def collate_data(data: Data, metadata: Data) -> Data:
    """Join FASTA sequences into CSV metadata rows by sequence_name
    (reference: __main__.py:88-110); errors on records missing from either."""
    name_idx = data.headers.index("sequence_name")
    sequence_idx = data.headers.index("sequence")
    nt_length_idx = data.headers.index("nt_length")

    meta_name_idx = metadata.headers.index("sequence_name")
    meta_sequence_idx = metadata.headers.index("sequence")
    meta_nt_length_idx = metadata.headers.index("nt_length")

    n = len(data.columns[sequence_idx])
    metadata.columns[meta_sequence_idx] = ["" for _ in range(n)]
    metadata.columns[meta_nt_length_idx] = ["" for _ in range(n)]

    for from_idx, name in enumerate(data.columns[name_idx]):
        if name not in metadata.columns[meta_name_idx]:
            print(f"Error -- record {name} is not found in both input files.")
            sys.exit(1)
        update_idx = metadata.columns[meta_name_idx].index(name)
        metadata.columns[meta_sequence_idx][update_idx] = data.columns[sequence_idx][from_idx]
        metadata.columns[meta_nt_length_idx][update_idx] = data.columns[nt_length_idx][from_idx]

    return metadata


def generate(file: str, opt_file: Optional[str], output_path: str) -> None:
    """Generate and write a human-editable [Config, Data] library JSON
    (reference: __main__.py:45-65)."""
    data, config, is_csv_req = _process_file(file, opt_file)
    data_opt, config_opt, is_csv_opt = _process_file(opt_file, file)

    final_config = config
    if data_opt is not None and is_csv_opt:
        final_config = config_opt

    if data_opt is not None:
        if is_csv_req:
            final_data = collate_data(data_opt, data)
        elif is_csv_opt:
            final_data = collate_data(data, data_opt)
        else:
            final_data = data
    else:
        final_data = data

    save_library(output_path, final_config, final_data)
