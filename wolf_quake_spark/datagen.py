"""Deterministic transcript synthesis (no external data).

Two jobs:

* **Parity fixtures** — wrap a raw Quake-style log (e.g. the reference's
  example logs, read from ``/root/reference/examples`` when available) into a
  transcripts table, one or more log lines per turn, ``text`` preserved
  byte-identically.  Golden tests compare pipeline aggregates against the
  reference's published outputs.
* **Scale generation** — a seeded synthetic game-log template replicated
  across fresh ``conv_id``s *inside Spark* (``range × broadcast template``),
  so generating a billion turns never touches the driver.  A ``mega_factor``
  knob produces one deliberately oversized conversation to exercise skew.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wolf_quake_spark.data_model import MOD_LOOKUP_ROWS, WORLD_ID

REFERENCE_EXAMPLES = "/root/reference/examples"

_ROLES = ("user", "assistant", "tool")
_TOOLS = ("bash", "python", "browser", "search", "editor", "read", "grep", None)


def transcripts_from_log(
    spark: SparkSession,
    log_text: str,
    conv_id: str,
    lines_per_turn: int = 1,
) -> DataFrame:
    """One conversation whose turns carry the log's lines verbatim."""
    lines = log_text.split("\n")
    # mirror Rust `.lines()`: a trailing newline does not yield an empty line
    if lines and lines[-1] == "":
        lines = lines[:-1]
    turns = [
        "\n".join(lines[i : i + lines_per_turn])
        for i in range(0, len(lines), lines_per_turn)
    ]
    rows = [
        (conv_id, i, _ROLES[i % 3], t, _TOOLS[i % len(_TOOLS)])
        for i, t in enumerate(turns)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    return df.withColumn(
        "ts",
        F.timestamp_seconds(F.lit(1704067200) + F.col("turn_idx")),
    )


def read_reference_log(name: str) -> str | None:
    """Load a reference example log if the reference checkout is present."""
    import os

    path = os.path.join(REFERENCE_EXAMPLES, name)
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        return f.read()


# ---------------------------------------------------------------------------
# Synthetic template (authored here; seeded, deterministic)
# ---------------------------------------------------------------------------

def synth_game_log(
    seed: int = 42,
    n_games: int = 8,
    players_per_game: int = 6,
    kills_per_game: int = 40,
    prose_ratio: float = 0.2,
    corrupt_ratio: float = 0.02,
) -> list[str]:
    """A synthetic Quake-style log exercising every event type.

    Includes world kills, self-kills, reconnects, renames, ignored tags,
    prose lines (fail the timestamp gate), a kill-less InitGame-flush path
    and an open game at EOF — every branch of the reference parser.
    """
    rng = random.Random(seed)
    names = [f"player_{chr(97 + i)}" for i in range(26)]
    out: list[str] = []

    def t() -> str:
        return f"{rng.randrange(0, 999)}:{rng.randrange(0, 60):02d}"

    for g in range(n_games):
        out.append(f" {t()} InitGame: \\sv_hostname\\synth srv\\mapname\\q3dm{g}")
        ids = rng.sample(range(2, 20), players_per_game)
        for cid in ids:
            out.append(f" {t()} ClientConnect: {cid}")
            nm = rng.choice(names)
            out.append(
                f" {t()} ClientUserinfoChanged: {cid} n\\{nm}\\t\\0\\model\\sarge"
            )
            out.append(f" {t()} ClientBegin: {cid}")
        kill_less = g % 5 == 3  # exercised InitGame-no-flush path
        n_kills = 0 if kill_less else kills_per_game + rng.randrange(-5, 6)
        for _ in range(max(0, n_kills)):
            if rng.random() < prose_ratio:
                out.append(f"assistant notes: game {g} progressing, score tied")
            if rng.random() < corrupt_ratio:
                out.append(f" {rng.randrange(10, 99)} {t()} ------------")
            killer = WORLD_ID if rng.random() < 0.2 else rng.choice(ids)
            victim = rng.choice(ids)
            mod_id, mod_name = rng.choice(MOD_LOOKUP_ROWS)
            kname = "<world>" if killer == WORLD_ID else "someone"
            out.append(
                f" {t()} Kill: {killer} {victim} {mod_id}: "
                f"{kname} killed someone by MOD_{mod_name.upper().replace(' ', '')}"
            )
            if rng.random() < 0.1:
                out.append(f" {t()} Item: {rng.randrange(1, 40)} weapon_rocketlauncher")
            if rng.random() < 0.05:
                cid = rng.choice(ids)
                nm = rng.choice(names)
                out.append(
                    f" {t()} ClientUserinfoChanged: {cid} n\\{nm}\\t\\1\\model\\xian"
                )
        # most games end cleanly; kill-less ones fall through to the next
        # InitGame (roster leak) — and the very last game stays open at EOF
        if not kill_less and g != n_games - 1:
            out.append(f" {t()} ShutdownGame:")
            out.append(f" {t()} ------------------------------------------------------------")
    out.append(f" {t()} say: match over")  # ignored tag; EOF leaves game open
    return out


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 64,
    lines_per_turn: int = 4,
    seed: int = 42,
    mega_factor: int = 0,
    **template_kw,
) -> DataFrame:
    """Replicate the seeded template across ``n_convs`` conversations.

    Generation is ``spark.range(n_convs) ⨯ broadcast(template turns)`` —
    fully distributed, deterministic, linear in cluster size.  If
    ``mega_factor > 0`` an extra conversation ``conv-mega`` holds the
    template repeated that many times (the skew case: one conv_id orders of
    magnitude larger than the median).
    """
    lines = synth_game_log(seed=seed, **template_kw)
    turns = [
        "\n".join(lines[i : i + lines_per_turn])
        for i in range(0, len(lines), lines_per_turn)
    ]
    tpl = spark.createDataFrame(
        list(enumerate(turns)), "tpl_idx int, text string"
    )
    n_turns = len(turns)

    convs = spark.range(n_convs).select(
        F.format_string("conv-%08d", F.col("id")).alias("conv_id")
    )
    base = convs.join(F.broadcast(tpl))
    if mega_factor > 0:
        mega = (
            spark.range(mega_factor)
            .select(F.col("id").alias("rep"))
            .join(F.broadcast(tpl))
            .select(
                F.lit("conv-mega").alias("conv_id"),
                (F.col("rep") * n_turns + F.col("tpl_idx")).cast("int").alias("tpl_idx"),
                "text",
            )
        )
        base = base.unionByName(mega)

    h = F.abs(F.hash("conv_id", "tpl_idx"))
    return base.select(
        "conv_id",
        F.col("tpl_idx").cast("int").alias("turn_idx"),
        F.element_at(F.array(*[F.lit(r) for r in _ROLES]), (h % 3 + 1).cast("int")).alias("role"),
        "text",
        F.when(
            h % 4 == 0,
            F.element_at(
                F.array(*[F.lit(x) for x in _TOOLS if x]), (h % 7 + 1).cast("int")
            ),
        ).alias("tool"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("tpl_idx")).alias("ts"),
    )
