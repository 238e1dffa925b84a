"""Regenerate functions/script_data.py from the Java regex classes.

One single-char document per scalar codepoint (surrogates excluded — they
cannot occur in well-formed strings), filtered through ``F.regexp_like``
with the Java patterns in ``functions.normalize.SCRIPT_CLASSES``, collapsed
to sorted intervals. Run when the container's JVM (and therefore its
Unicode tables) changes; the boundary test pins drift per run.

Usage: python scripts/gen_script_tables.py  (rewrites script_data.py)
"""
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from nail_parquet_spark.functions.normalize import SCRIPT_CLASSES
    from nail_parquet_spark.session import get_spark

    spark = get_spark("gen-script-tables", master="local[8]",
                      shuffle_partitions=8)
    rows = [(cp, chr(cp)) for cp in range(0x110000)
            if not (0xD800 <= cp < 0xE000)]
    chars = spark.createDataFrame(rows, "cp int, ch string")
    tables: dict[str, list[list[int]]] = {}
    for name, (java, _) in SCRIPT_CLASSES.items():
        hits = sorted(r["cp"] for r in
                      chars.filter(F.regexp_like(F.col("ch"), F.lit(java)))
                      .select("cp").collect())
        iv: list[list[int]] = []
        for c in hits:
            if iv and c == iv[-1][1] + 1:
                iv[-1][1] = c
            else:
                iv.append([c, c])
        tables[name] = iv
        print(f"{name}: {len(hits)} codepoints, {len(iv)} intervals")
    spark.stop()

    out = ['"""Unicode-script interval tables for the script-profile Arrow '
           "kernel.\n\nGENERATED from the Java regex classes the SQL path "
           "uses (one single-char\ndocument per scalar codepoint, filtered "
           "through ``F.regexp_like`` with\n``functions.normalize."
           "SCRIPT_CLASSES``'s Java patterns on this container's\nJVM) — so "
           "the kernel's ground truth IS the oracle-attested regex path, not"
           "\nan independently transcribed copy of Scripts.txt. Regenerate "
           "with\nscripts/gen_script_tables.py if the JVM's Unicode version "
           "ever changes;\ntest_script_kernel_boundaries sweeps every "
           "interval edge (and a random\ncodepoint sample) against the regex "
           "path per run.\n\nThe seven classes are mutually disjoint "
           "(Unicode scripts are, and [0-9]\nbelongs to none of them), so "
           "one sorted table with a class id per interval\nanswers every "
           'class in a single searchsorted pass.\n"""\n\n'
           "SCRIPT_INTERVALS: dict[str, list[tuple[int, int]]] = {"]
    for name, iv in tables.items():
        body = ", ".join(f"({a}, {b})" for a, b in iv)
        wrapped = textwrap.fill(body, width=74, initial_indent="        ",
                                subsequent_indent="        ")
        out.append(f'    "{name}": [\n{wrapped}\n    ],')
    out.append("}\n")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "nail_parquet_spark", "functions",
        "script_data.py")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
