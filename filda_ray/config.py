"""Run-configuration layer (survey M23 analog).

Reference semantics (`MCBEF_NAMELIST.py:27-142`, `FILDA.py:57-130`):
``key : value`` text lines, ``#`` comments, decorative section banners
and rules, per-key TYPED converters (string / bool T-F / int / float /
space-separated lists), repeated keys and continuation lines appending
to the previous key's content.

Engine form: the same grammar parsed against a typed dataclass — the
converter for each key is derived from the dataclass field annotation
instead of an eval'd registry — and the parsed config is recorded in
the product manifest lineage so a run is reproducible from its output.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, fields

# human-readable namelist key -> RunConfig field
KEYWORDS = {
    "Value column": "value_col",
    "Ring ladder": "rings",
    "Min background n": "min_bg_n",
    "Z low": "z_lo",
    "Z high": "z_hi",
    "Trim fraction": "trim_frac",
    "Quantize": "quantize",
    "Replicate": "replicate",
    "Concurrency": "concurrency",
    "Materialize narrow?": "materialize_narrow",
    "Partition column": "partition_col",
    "Output version": "output_version",
    "Pages directory": "pages_dir",
}
CONT = "&"  # continuation marker in the key field


@dataclass
class RunConfig:
    """Typed flagship-run parameters (namelist-equivalent dataclass)."""

    value_col: str = "n_chars"
    rings: tuple = (1, 2)
    min_bg_n: int = 10
    z_lo: float = 3.0
    z_hi: float = 6.0
    trim_frac: float = 0.25
    # background histogram quantum: bounds the value domain for
    # continuous metrics (distinct values <= range/quantize per tile).
    # 1.0 is EXACT for integer metrics (the default value_col) and
    # unit-bin approximate for floats; 'None' restores exact float
    # medians at unbounded-domain cost.
    quantize: float | None = 1.0
    replicate: int = 1
    concurrency: int | None = None
    materialize_narrow: bool = True
    partition_col: str = "pc_tile"
    output_version: str = "v1"
    pages_dir: str | None = None

    @classmethod
    def from_file(cls, path: str) -> "RunConfig":
        with open(path) as f:
            return cls.from_text(f.read())

    @classmethod
    def from_text(cls, text: str) -> "RunConfig":
        raw = parse_namelist(text)
        defaults = cls()
        kwargs = {}
        for key, content in raw.items():
            name = KEYWORDS.get(key)
            if name is None:
                raise KeyError(f"unknown config key: {key!r}")
            kwargs[name] = _convert(content, getattr(defaults, name))
        return cls(**kwargs)

    def to_lineage(self) -> dict:
        return {k: (list(v) if isinstance(v, tuple) else v)
                for k, v in asdict(self).items()}


def parse_namelist(text: str) -> dict[str, str]:
    """``key : value`` lines -> {key: accumulated content}.

    Mirrors the reference grammar: '#' comments and lines without ':'
    are skipped, '%%% ... %%%' banners are decorative, repeated keys
    and continuation lines ('&' in the key field) append."""
    out: dict[str, str] = {}
    current: str | None = None
    for line in text.splitlines():
        s = line.strip()
        if not s or s.startswith("#") or ":" not in s:
            continue
        head, content = s.split(":", 1)
        head, content = head.strip(), content.strip()
        if head.startswith("%%%"):
            continue
        if head in ("", CONT):
            if current is None:
                raise ValueError("continuation line before any key")
            out[current] += " " + content
            continue
        out[head] = (out[head] + " " + content) if head in out else content
        current = head
    return out


def _convert(content: str, default):
    """Typed conversion driven by the default value's type."""
    content = content.strip()
    if default is None or content == "None":
        # optional fields: int if numeric, else string, None if 'None'
        if content == "None":
            return None
        try:
            return int(content)
        except ValueError:
            return content
    if isinstance(default, bool):
        return content.upper() in ("T", "TRUE", "1", "YES")
    if isinstance(default, tuple):
        return tuple(int(x) for x in content.split())
    if isinstance(default, int):
        return int(content)
    if isinstance(default, float):
        return float(content)
    return content


def config_fields() -> list[str]:
    return [f.name for f in fields(RunConfig)]
