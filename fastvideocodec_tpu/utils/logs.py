"""Log writers in the reference's exact 2-line format so plot_*/simulation
tooling keeps parsing (SURVEY.md §5 'Metrics / logging'):

line 1: 'level,bpp,enc_t,dec_t[,aux,aux2,aux3,aux4]'
line 2: python-repr list of per-frame PSNRs
(reference eval.py:332-337, parsed by plot_vesper.py:520-537)."""

from __future__ import annotations

import ast
import os


def write_eval_log(
    path: str,
    level: int,
    bpp: float,
    enc_t: float,
    dec_t: float,
    psnr_list: list,
    aux: tuple = (),
):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        line = f"{level},{bpp:.4f},{enc_t:.3f},{dec_t:.3f}"
        for a in aux:
            line += f",{a:.4f}"
        f.write(line + "\n")
        f.write(str([float(p) for p in psnr_list]) + "\n")


def read_eval_log(path: str):
    """Parses the 2-line format back into [(header dict, psnr list), ...]."""
    records = []
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    for i in range(0, len(lines) - 1, 2):
        parts = lines[i].split(",")
        header = {
            "level": int(float(parts[0])),
            "bpp": float(parts[1]),
            "enc_t": float(parts[2]),
            "dec_t": float(parts[3]),
            "aux": [float(p) for p in parts[4:]],
        }
        psnrs = ast.literal_eval(lines[i + 1])
        records.append((header, psnrs))
    return records
