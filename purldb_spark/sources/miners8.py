"""Per-ecosystem miner mappers, batch 8: alpm / msys2 (.PKGINFO +
.BUILDINFO key=value metadata) and freebsd (packagesite.yaml line
manifests). Same design as sources/miners*.py — pure column expressions,
no Python UDFs:

- pkginfo parse (minecode/msys2.py:64-246 parse_pkginfo +
  normalize_package_data_keys): "key = value" lines, blank/comment lines
  skipped, repeated keys accumulate in order (license/depend/... are
  list fields), key aliases pkgname->name, pkgbase->source_name,
  pkgver->version, pkgdesc->desc, license->licenses, depend->depends.
  Here every key maps to an ordered value array (the reference's
  single-vs-list distinction is a read-side detail — element_at(.., 1)
  reads a single).
- alpm build (minecode/miners/alpm.py:17-71 build_packages): .PKGINFO
  carries desc/version/licenses/url/size/depends, .BUILDINFO carries the
  packager ("Name <email>" split, minecode/debutils.py:11-22) and the
  pkgbuild sha256; dependency purls are pkg:alpm/<name>.
- freebsd (minecode/miners/freebsd.py:98-119 build_packages +
  packagedcode CompactManifestHandler): the packagesite.yaml is one JSON
  manifest per line ("{"/"}"/blank lines skipped); arch+origin become
  purl qualifiers (alphabetical), comment is the description, www the
  homepage, categories the keywords, maintainer a party, and the license
  list joins under licenselogic ("and"/"or"/"single" ->
  " AND "/" OR "/bare, the reference's dual license logic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------------ alpm --

#: pkginfo key aliases (normalize_package_data_keys, msys2.py:248-280)
_PKGINFO_ALIASES = {
    "pkgname": "name",
    "pkgbase": "source_name",
    "pkgver": "version",
    "pkgdesc": "desc",
    "license": "licenses",
    "depend": "depends",
    "makedepend": "makedepends",
    "optdepend": "optdepends",
    "pkgrel": "release",
}


def pkginfo_map_col(col_name: str) -> Column:
    """pkginfo_map over a named column (the SQL form needs the name)."""
    alias_sql = "rk"
    for old, new in _PKGINFO_ALIASES.items():
        alias_sql = f"CASE WHEN rk = '{old}' THEN '{new}' ELSE {alias_sql} END"
    key_of_line = "(" + alias_sql.replace(
        "rk", "trim(substring_index(l, '=', 1))"
    ) + ")"
    expr = f"""
    aggregate(
      filter(transform(split({col_name}, '\\n'), l -> trim(l)),
             l -> l != '' AND NOT startswith(l, '#') AND instr(l, '=') > 0),
      cast(map() as map<string, array<string>>),
      (acc, l) ->
        map_concat(
          map_filter(acc, (mk, mv) -> mk != {key_of_line}),
          map({key_of_line},
              coalesce(acc[{key_of_line}], cast(array() as array<string>))
                || array(trim(substring(l, instr(l, '=') + 1)))))
    )
    """
    return F.expr(expr)


def _one(m: Column, key: str) -> Column:
    return F.element_at(m[key], 1)


def map_alpm_docs(
    docs: DataFrame,
    pkginfo_col: str = "pkginfo",
    buildinfo_col: str = "buildinfo",
    name_col: str = "name",
    url_col: str = "download_url",
) -> DataFrame:
    """Arch/alpm package metadata -> catalog rows (alpm.py:17-71)."""
    pi = pkginfo_map_col(pkginfo_col)
    bi = pkginfo_map_col(buildinfo_col)
    rows = docs.select(
        F.col(name_col).alias("_name"),
        F.col(url_col).alias("_url"),
        pi.alias("p"),
        bi.alias("b"),
    )
    p, b = F.col("p"), F.col("b")
    packager = _one(b, "packager")
    m_name = F.nullif(F.trim(F.substring_index(packager, "<", 1)), F.lit(""))
    m_email = F.nullif(
        F.trim(F.regexp_extract(packager, "<([^>]*)>?", 1)), F.lit("")
    )
    deps = F.when(
        p["depends"].isNotNull(),
        F.array_join(
            F.transform(p["depends"], lambda d: F.concat(F.lit("pkg:alpm/"), d)),
            "; ",
        ),
    )
    version = _one(p, "version")
    return rows.select(
        F.lit("alpm").alias("type"),
        F.col("_name").alias("name"),
        version.alias("version"),
        F.concat_ws(
            "@", F.concat(F.lit("pkg:alpm/"), F.col("_name")), version
        ).alias("purl"),
        _one(p, "desc").alias("description"),
        _one(p, "url").alias("repository_homepage_url"),
        F.when(
            p["licenses"].isNotNull(), F.array_join(p["licenses"], "; ")
        ).alias("extracted_license_statement"),
        m_name.alias("maintainer_name"),
        m_email.alias("maintainer_email"),
        _one(p, "size").cast("long").alias("size"),
        _one(b, "pkgbuild_sha256sum").alias("sha256"),
        deps.alias("dependencies"),
        F.col("_url").alias("download_url"),
        F.lit("alpm_metadata").alias("datasource_id"),
    )


# ---------------------------------------------------------------- freebsd --

FREEBSD_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("origin", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("comment", T.StringType()),
        T.StructField("desc", T.StringType()),
        T.StructField("maintainer", T.StringType()),
        T.StructField("www", T.StringType()),
        T.StructField("arch", T.StringType()),
        T.StructField("sum", T.StringType()),
        T.StructField("flatsize", T.LongType()),
        T.StructField("pkgsize", T.LongType()),
        T.StructField("repopath", T.StringType()),
        T.StructField("licenselogic", T.StringType()),
        T.StructField("licenses", T.ArrayType(T.StringType())),
        T.StructField("categories", T.ArrayType(T.StringType())),
    ]
)


def map_freebsd_docs(
    docs: DataFrame, text_col: str = "packagesite", base_url_col: str | None = None
) -> DataFrame:
    """packagesite.yaml line manifests -> catalog rows
    (freebsd.py:98-119; field semantics per packagedcode
    CompactManifestHandler). When ``base_url_col`` is given, repopath
    resolves to a download URL under it."""
    lines = docs.select(
        *([F.col(base_url_col).alias("_base")] if base_url_col else []),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).filter(~F.trim(F.col("line")).isin("", "{", "}"))
    j = F.from_json(F.col("line"), FREEBSD_SCHEMA)
    rows = lines.select(
        *([F.col("_base")] if base_url_col else []), j.alias("m")
    ).filter(F.col("m")["name"].isNotNull())
    m = F.col("m")
    name, ver = m["name"], m["version"]
    quals = F.concat_ws(
        "&",
        *[
            F.when(
                F.nullif(c, F.lit("")).isNotNull(), F.concat(F.lit(q + "="), c)
            )
            for q, c in (("arch", m["arch"]), ("origin", m["origin"]))
        ],
    )
    logic_join = (
        F.when(m["licenselogic"] == "or", F.lit(" OR "))
        .when(m["licenselogic"] == "and", F.lit(" AND "))
        .otherwise(F.lit(" AND "))
    )
    lic = F.when(
        m["licenses"].isNotNull() & (F.size(m["licenses"]) > 0),
        F.aggregate(
            F.slice(m["licenses"], 2, 1 << 10),
            F.element_at(m["licenses"], 1),
            lambda acc, x: F.concat(acc, logic_join, x),
        ),
    )
    # CompactManifestHandler derives the canonical mirror URL from the
    # arch when no explicit repo base is given (the reference's
    # pkg-devel_index fixture shows https://pkg.freebsd.org/<arch>/
    # latest/All/<name>-<version>.txz)
    derived = F.when(
        m["arch"].isNotNull(),
        F.concat(
            F.lit("https://pkg.freebsd.org/"), m["arch"], F.lit("/latest/All/"),
            name, F.lit("-"), ver, F.lit(".txz"),
        ),
    )
    dl = (
        F.coalesce(
            F.when(
                m["repopath"].isNotNull(),
                F.concat(F.col("_base"), F.lit("/"), m["repopath"]),
            ),
            derived,
        )
        if base_url_col
        else derived
    )
    return rows.select(
        F.lit("freebsd").alias("type"),
        name.alias("name"),
        ver.alias("version"),
        F.concat(
            F.lit("pkg:freebsd/"),
            name,
            F.lit("@"),
            ver,
            F.when(
                F.nullif(quals, F.lit("")).isNotNull(), F.concat(F.lit("?"), quals)
            ).otherwise(F.lit("")),
        ).alias("purl"),
        # description is the long `desc` text, NOT the one-line comment
        # (CompactManifestHandler semantics, reference fixture-verified)
        F.coalesce(m["desc"], m["comment"]).alias("description"),
        m["www"].alias("homepage_url"),
        F.when(
            m["origin"].isNotNull(),
            F.concat(F.lit("https://svnweb.freebsd.org/ports/head/"), m["origin"]),
        ).alias("code_view_url"),
        m["maintainer"].alias("maintainer"),
        lic.alias("extracted_license_statement"),
        # keywords = the origin's category segment (CompactManifestHandler),
        # with the categories list as fallback
        F.coalesce(
            F.when(
                m["origin"].isNotNull(),
                F.substring_index(m["origin"], "/", 1),
            ),
            F.when(
                m["categories"].isNotNull(), F.array_join(m["categories"], "; ")
            ),
        ).alias("keywords"),
        m["sum"].alias("sha256"),
        m["flatsize"].alias("installed_size"),
        m["pkgsize"].alias("size"),
        dl.alias("download_url"),
        F.lit("freebsd_compact_manifest").alias("datasource_id"),
    )
