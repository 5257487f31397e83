"""Deterministic synthetic ``code_files`` generator (FIXTURES.md §2).

Materializes the pinned production input schema (BASELINE.json:15:
``repo, path, commit, lang, content``) as local Parquet — a pure
function of (sf): NumPy ``default_rng(42)``, no time/dict-order
dependence, byte-stable across runs.

The content is code-like text with two deliberate properties:
  * keyword Zipf(a=1.3) over a 64-word hot vocab — the hot-term skew
    fixture for the salted segment merge (SURVEY.md B5), and
  * camelCase/snake_case compound identifiers — the code-aware
    tokenizer fixture (FIXTURES.md §3.1b).

Also emits ``code_files_sha.parquet`` (repo, path, commit,
content_sha256) computed *by the generator*, so the sha-equality
invariant test (BASELINE.json:15) has an independent source.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
ROWS = {"0.001": 1_000, "0.01": 10_000, "0.1": 100_000, "0.3": 300_000, "1": 1_000_000}
# sfs above this row count generate in independent chunks (bounded
# memory, per-chunk rng streams) — used for the large-input scaling
# evidence where the parallel section must dwarf fixed cost
CHUNK_ROWS = 100_000

KEYWORDS = [
    "def", "return", "import", "func", "class", "if", "else", "for",
    "while", "try", "except", "raise", "with", "as", "from", "pass",
    "break", "continue", "lambda", "yield", "global", "assert", "del",
    "not", "and", "or", "in", "is", "none", "true", "false", "self",
    "var", "let", "const", "type", "struct", "interface", "package",
    "public", "private", "static", "void", "int", "string", "bool",
    "float", "map", "chan", "go", "defer", "select", "case", "switch",
    "default", "range", "new", "make", "len", "cap", "append", "print",
    "match", "impl",
]
assert len(KEYWORDS) == 64

LANGS = ["py", "go", "js", "java", "rs", "md"]
EXT = {"py": "py", "go": "go", "js": "js", "java": "java", "rs": "rs", "md": "md"}

_IDENT_HEADS = [
    "parse", "build", "merge", "scan", "read", "write", "fetch", "load",
    "store", "hash", "index", "query", "score", "rank", "split", "join",
    "encode", "decode", "pack", "flush", "compact", "stream", "batch",
    "shard", "route", "retry", "cache", "eval", "plan", "exec", "spawn",
    "close",
]
_IDENT_TAILS = [
    "config", "buffer", "segment", "posting", "document", "term", "token",
    "result", "handler", "worker", "client", "server", "table", "record",
    "offset", "cursor", "block", "header", "footer", "meta", "state",
    "queue", "stats", "value", "entry", "field", "chunk", "slice", "node",
    "graph", "tree", "list",
]


def _identifier_pool(rng: np.random.Generator, n: int = 20_000) -> np.ndarray:
    heads = rng.choice(_IDENT_HEADS, size=n)
    mids = rng.choice(_IDENT_TAILS, size=n)
    tails = rng.choice(_IDENT_TAILS, size=n)
    styles = rng.integers(0, 3, size=n)  # 0 snake2, 1 camel2, 2 camel3
    out = np.empty(n, dtype=object)
    for i in range(n):
        h, m, t = heads[i], mids[i], tails[i]
        if styles[i] == 0:
            out[i] = f"{h}_{m}"
        elif styles[i] == 1:
            out[i] = f"{h}{m.capitalize()}"
        else:
            out[i] = f"{h}{m.capitalize()}{t.capitalize()}"
    return out


def _zipf_indices(rng: np.random.Generator, n: int, k: int, a: float = 1.3) -> np.ndarray:
    """Zipf(a)-distributed indices in [0, k) — hot head, long tail."""
    ranks = np.arange(1, k + 1, dtype=np.float64)
    p = ranks**-a
    p /= p.sum()
    return rng.choice(k, size=n, p=p)


def generate_code_files(sf: str, out_dir: str) -> str:
    """Generate code_files + code_files_sha parquet for scale factor sf.

    Returns the path of the code_files parquet. Idempotent: skips work
    if both outputs already exist. Large sfs (> CHUNK_ROWS) stream out in
    deterministic per-chunk rng streams via ParquetWriter.
    """
    n = ROWS[sf]
    path_main = os.path.join(out_dir, "code_files.parquet")
    path_sha = os.path.join(out_dir, "code_files_sha.parquet")
    if os.path.exists(path_main) and os.path.exists(path_sha):
        return path_main
    if n > CHUNK_ROWS:
        return _generate_chunked(n, out_dir, path_main, path_sha)
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    idents = _identifier_pool(rng)

    n_repos = max(20, n // 100)
    repo_idx = np.arange(n) % n_repos
    repos = np.array([f"org{r // 50}/repo{r % 50}" for r in repo_idx], dtype=object)
    lang_idx = _zipf_indices(rng, n, len(LANGS), a=1.3)
    langs = np.array([LANGS[i] for i in lang_idx], dtype=object)
    mods = rng.choice(_IDENT_TAILS, size=n)
    names = rng.choice(_IDENT_HEADS, size=n)
    seqs = np.arange(n)
    paths = np.array(
        [
            f"src/{mods[i]}/{names[i]}_{seqs[i]}.{EXT[langs[i]]}"
            for i in range(n)
        ],
        dtype=object,
    )
    commits = np.array(
        [
            hashlib.sha256(f"{repos[i]}|{paths[i]}|{SEED}".encode()).hexdigest()[:40]
            for i in range(n)
        ],
        dtype=object,
    )

    n_lines = rng.integers(30, 201, size=n)
    total_lines = int(n_lines.sum())
    # 3 keywords + 2 identifiers per line, all drawn up front (vectorized)
    kw = np.array(KEYWORDS, dtype=object)[
        _zipf_indices(rng, total_lines * 3, 64, a=1.3)
    ].reshape(total_lines, 3)
    idn = idents[rng.integers(0, len(idents), size=total_lines * 2)].reshape(
        total_lines, 2
    )
    line_texts = np.array(
        [
            f"{kw[j, 0]} {idn[j, 0]}({idn[j, 1]}): {kw[j, 1]} {kw[j, 2]}"
            for j in range(total_lines)
        ],
        dtype=object,
    )
    bounds = np.concatenate(([0], np.cumsum(n_lines)))
    contents = np.array(
        ["\n".join(line_texts[bounds[i] : bounds[i + 1]]) for i in range(n)],
        dtype=object,
    )
    shas = np.array(
        [hashlib.sha256(c.encode()).hexdigest() for c in contents], dtype=object
    )

    table = pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )
    pq.write_table(table, path_main)
    pq.write_table(
        pa.table(
            {
                "repo": pa.array(repos, pa.string()),
                "path": pa.array(paths, pa.string()),
                "commit": pa.array(commits, pa.string()),
                "content_sha256": pa.array(shas, pa.string()),
            }
        ),
        path_sha,
    )
    return path_main


def _make_chunk(rng: np.random.Generator, idents: np.ndarray, lo: int, n: int) -> dict:
    """One deterministic chunk of rows [lo, lo+n) — same content model as
    the single-shot path, independent rng stream per chunk."""
    n_repos = max(20, n // 100)
    repo_idx = (np.arange(lo, lo + n)) % n_repos
    repos = np.array([f"org{r // 50}/repo{r % 50}" for r in repo_idx], dtype=object)
    lang_idx = _zipf_indices(rng, n, len(LANGS), a=1.3)
    langs = np.array([LANGS[i] for i in lang_idx], dtype=object)
    mods = rng.choice(_IDENT_TAILS, size=n)
    names = rng.choice(_IDENT_HEADS, size=n)
    seqs = np.arange(lo, lo + n)
    paths = np.array(
        [f"src/{mods[i]}/{names[i]}_{seqs[i]}.{EXT[langs[i]]}" for i in range(n)],
        dtype=object,
    )
    commits = np.array(
        [
            hashlib.sha256(f"{repos[i]}|{paths[i]}|{SEED}".encode()).hexdigest()[:40]
            for i in range(n)
        ],
        dtype=object,
    )
    n_lines = rng.integers(30, 201, size=n)
    total_lines = int(n_lines.sum())
    kw = np.array(KEYWORDS, dtype=object)[
        _zipf_indices(rng, total_lines * 3, 64, a=1.3)
    ].reshape(total_lines, 3)
    idn = idents[rng.integers(0, len(idents), size=total_lines * 2)].reshape(
        total_lines, 2
    )
    line_texts = np.array(
        [
            f"{kw[j, 0]} {idn[j, 0]}({idn[j, 1]}): {kw[j, 1]} {kw[j, 2]}"
            for j in range(total_lines)
        ],
        dtype=object,
    )
    bounds = np.concatenate(([0], np.cumsum(n_lines)))
    contents = np.array(
        ["\n".join(line_texts[bounds[i] : bounds[i + 1]]) for i in range(n)],
        dtype=object,
    )
    shas = np.array(
        [hashlib.sha256(c.encode()).hexdigest() for c in contents], dtype=object
    )
    return {
        "repo": repos, "path": paths, "commit": commits, "lang": langs,
        "content": contents, "content_sha256": shas,
    }


def _generate_chunked(n: int, out_dir: str, path_main: str, path_sha: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    idents = _identifier_pool(np.random.default_rng(SEED))
    main_schema = pa.schema(
        [(c, pa.string()) for c in ("repo", "path", "commit", "lang", "content")]
    )
    sha_schema = pa.schema(
        [(c, pa.string()) for c in ("repo", "path", "commit", "content_sha256")]
    )
    wm = pq.ParquetWriter(path_main + ".tmp", main_schema)
    ws = pq.ParquetWriter(path_sha + ".tmp", sha_schema)
    for ci, lo in enumerate(range(0, n, CHUNK_ROWS)):
        rows = min(CHUNK_ROWS, n - lo)
        d = _make_chunk(np.random.default_rng([SEED, ci]), idents, lo, rows)
        wm.write_table(
            pa.table({c: pa.array(d[c], pa.string()) for c in main_schema.names})
        )
        ws.write_table(
            pa.table({c: pa.array(d[c], pa.string()) for c in sha_schema.names})
        )
    wm.close()
    ws.close()
    os.replace(path_main + ".tmp", path_main)
    os.replace(path_sha + ".tmp", path_sha)
    return path_main
