"""V1 version-list APIs — the parse stage of the reference's 11 ecosystem
``VersionAPI`` fetchers (packagedb/package_managers.py:100-556).

The reference fetches one package per HTTP call and yields
``PackageVersion(value, release_date)``. At 100 TB / millions of packages
the fetch is a politeness-limited frontier (T7 rate-limited stream,
driver/mapPartitions boundary — same split as S3/V1 in SURVEY §2.9); THIS
module is everything after the bytes arrive, expressed as pure column
expressions so a billion fetched documents parse in one whole-stage-codegen
projection:

- one row per fetched document ``(pkg, doc)`` in, one row per
  ``(pkg, version, release_date)`` out,
- JSON shapes via ``from_json`` with explicit schemas (pypi, crates,
  rubygems, npm, debian, nuget, composer, hex, launchpad),
- maven-metadata.xml via regexp extraction (MavenVersionAPI.extract_versions
  iterates ``<version>`` tags, package_managers.py:341-345),
- goproxy ``@v/list`` plain text via line split
  (GoproxyVersionAPI.fetch_version_info, package_managers.py:486-512).

Paginated APIs (launchpad ``next_collection_link``) become multiple doc
rows per pkg — the parser is page-at-a-time, so pagination state lives in
the fetch frontier, not here.

Release dates are kept as ISO-8601 strings (the reference's
``PackageVersion.to_dict`` emits isoformat, package_managers.py:40-44);
``split_until`` reproduces ``VersionAPI.get_until`` (valid vs newer
partition, package_managers.py:109-124) as a boolean column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "remove_debian_epoch",
    "go_escape_path",
    "api_package_name",
    "split_until",
    "parse_launchpad",
    "parse_pypi",
    "parse_crates",
    "parse_rubygems",
    "parse_npm",
    "parse_debian",
    "parse_maven_metadata",
    "parse_nuget",
    "parse_composer",
    "parse_hex",
    "parse_goproxy_list",
    "PARSERS_BY_TYPE",
]


def remove_debian_epoch(version: Column) -> Column:
    """remove_debian_default_epoch (package_managers.py:134-136): the
    reference does a plain ``replace("0:", "")`` anywhere in the string —
    mirrored exactly (it is intentionally not anchored)."""
    return F.replace(version, F.lit("0:"), F.lit(""))


def go_escape_path(path: Column) -> Column:
    """GoproxyVersionAPI.escape_path (package_managers.py:469-485):
    uppercase -> '!' + lowercase, for case-insensitive proxy paths."""
    return F.array_join(
        F.transform(
            F.split(path, ""),
            lambda c: F.when(c.rlike("^[A-Z]$"), F.concat(F.lit("!"), F.lower(c))).otherwise(c),
        ),
        "",
    )


def api_package_name(ptype: Column, namespace: Column, name: Column) -> Column:
    """get_api_package_name (package_managers.py:566-583): the name string
    each ecosystem API expects for a purl."""
    ns = F.when(namespace == "", F.lit(None)).otherwise(namespace)
    return (
        F.when(name.isNull() | (name == ""), F.lit(None))
        .when(ptype == "apache", F.concat(ptype, F.lit("/"), name))
        .when(ptype.isin("nuget", "pypi", "gem", "deb") | ns.isNull(), name)
        .when(ptype == "maven", F.concat(ns, F.lit(":"), name))
        .when(ptype.isin("composer", "golang", "npm", "github"), F.concat(ns, F.lit("/"), name))
        .otherwise(F.lit(None))
    )


def split_until(release_date: Column, until: Column) -> Column:
    """VersionAPI.get_until (package_managers.py:109-124): True -> the
    version is NEWER than ``until`` (release known and after the cutoff),
    False -> valid. Dateless versions are always valid."""
    return until.isNotNull() & release_date.isNotNull() & (release_date > until)


# ------------------------------------------------------------------ JSON --

_LAUNCHPAD_SCHEMA = T.StructType(
    [
        T.StructField(
            "entries",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("source_package_version", T.StringType()),
                        T.StructField("date_published", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("next_collection_link", T.StringType()),
    ]
)


def parse_launchpad(docs: DataFrame, pkg: str = "pkg", doc: str = "doc") -> DataFrame:
    """LaunchpadVersionAPI (package_managers.py:139-175): one page of
    getPublishedSources JSON -> (pkg, version, release_date); default
    Debian epoch stripped, versionless entries dropped."""
    j = F.from_json(F.col(doc), _LAUNCHPAD_SCHEMA)
    e = F.explode(j["entries"])
    out = docs.select(F.col(pkg).alias("pkg"), e.alias("e"))
    ver = remove_debian_epoch(F.col("e.source_package_version"))
    return out.where(F.col("e.source_package_version").isNotNull()).select(
        "pkg",
        ver.alias("version"),
        F.col("e.date_published").alias("release_date"),
    )


_PYPI_SCHEMA = T.StructType(
    [
        T.StructField(
            "releases",
            T.MapType(
                T.StringType(),
                T.ArrayType(
                    T.StructType([T.StructField("upload_time_iso_8601", T.StringType())])
                ),
            ),
        )
    ]
)


def parse_pypi(docs: DataFrame, pkg: str = "pkg", doc: str = "doc") -> DataFrame:
    """PypiVersionAPI (package_managers.py:177-229): releases map ->
    one row per version with downloads; release_date = LATEST upload time
    across the version's download items (get_latest_date)."""
    j = F.from_json(F.col(doc), _PYPI_SCHEMA)
    kv = F.explode(j["releases"])
    out = docs.select(F.col(pkg).alias("pkg"), kv.alias("version", "downloads"))
    latest = F.array_max(F.transform(F.col("downloads"), lambda d: d["upload_time_iso_8601"]))
    return out.where(F.size("downloads") > 0).select(
        "pkg", "version", latest.alias("release_date")
    )


_CRATES_SCHEMA = T.StructType(
    [
        T.StructField(
            "versions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("num", T.StringType()),
                        T.StructField("updated_at", T.StringType()),
                    ]
                )
            ),
        )
    ]
)


def parse_crates(docs: DataFrame, pkg: str = "pkg", doc: str = "doc") -> DataFrame:
    """CratesVersionAPI (package_managers.py:231-244)."""
    v = F.explode(F.from_json(F.col(doc), _CRATES_SCHEMA)["versions"])
    return docs.select(F.col(pkg).alias("pkg"), v.alias("v")).select(
        "pkg", F.col("v.num").alias("version"), F.col("v.updated_at").alias("release_date")
    )


_RUBY_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("number", T.StringType()),
            T.StructField("published_at", T.StringType()),
            T.StructField("created_at", T.StringType()),
        ]
    )
)


def parse_rubygems(docs: DataFrame, pkg: str = "pkg", doc: str = "doc") -> DataFrame:
    """RubyVersionAPI (package_managers.py:246-267): top-level array;
    published_at, else created_at; number-less releases dropped."""
    r = F.explode(F.from_json(F.col(doc), _RUBY_SCHEMA))
    out = docs.select(F.col(pkg).alias("pkg"), r.alias("r"))
    return out.where(F.col("r.number").isNotNull()).select(
        "pkg",
        F.col("r.number").alias("version"),
        F.coalesce("r.published_at", "r.created_at").alias("release_date"),
    )


_NPM_SCHEMA = T.StructType(
    [
        # values are full version manifests; only the keys matter here, so
        # an empty struct swallows any object shape
        T.StructField("versions", T.MapType(T.StringType(), T.StructType([]))),
        T.StructField("time", T.MapType(T.StringType(), T.StringType())),
    ]
)


def parse_npm(docs: DataFrame, pkg: str = "pkg", doc: str = "doc") -> DataFrame:
    """NpmVersionAPI (package_managers.py:269-285): iterate the versions
    map's keys, release date looked up in the top-level time map."""
    j = F.from_json(F.col(doc), _NPM_SCHEMA)
    v = F.explode(F.map_keys(j["versions"]))
    out = docs.select(F.col(pkg).alias("pkg"), v.alias("version"), j["time"].alias("time"))
    return out.select("pkg", "version", F.col("time")[F.col("version")].alias("release_date"))


_DEBIAN_SCHEMA = T.StructType(
    [
        T.StructField("error", T.StringType()),
        T.StructField(
            "versions",
            T.ArrayType(T.StructType([T.StructField("version", T.StringType())])),
        ),
    ]
)


def parse_debian(docs: DataFrame, pkg: str = "pkg", doc: str = "doc") -> DataFrame:
    """DebianVersionAPI (package_managers.py:287-307): skip error
    responses, strip the default epoch, no release dates in this API."""
    j = F.from_json(F.col(doc), _DEBIAN_SCHEMA)
    out = docs.where(j["error"].isNull() & j["versions"].isNotNull()).select(
        F.col(pkg).alias("pkg"), F.explode(j["versions"]).alias("v")
    )
    return out.select(
        "pkg",
        remove_debian_epoch(F.col("v.version")).alias("version"),
        F.lit(None).cast("string").alias("release_date"),
    )


_NUGET_SCHEMA = T.StructType(
    [
        T.StructField(
            "items",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "items",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "catalogEntry",
                                            T.StructType(
                                                [
                                                    T.StructField("version", T.StringType()),
                                                    T.StructField("published", T.StringType()),
                                                ]
                                            ),
                                        )
                                    ]
                                )
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)


def parse_nuget(docs: DataFrame, pkg: str = "pkg", doc: str = "doc") -> DataFrame:
    """NugetVersionAPI.extract_versions (package_managers.py:348-380):
    registration pages -> nested items -> catalogEntry."""
    g = F.explode(F.from_json(F.col(doc), _NUGET_SCHEMA)["items"])
    out = docs.select(F.col(pkg).alias("pkg"), g.alias("g"))
    e = F.explode(F.col("g.items"))
    out = out.select("pkg", e.alias("e"))
    return out.where(F.col("e.catalogEntry.version").isNotNull()).select(
        "pkg",
        F.col("e.catalogEntry.version").alias("version"),
        F.col("e.catalogEntry.published").alias("release_date"),
    )


_COMPOSER_SCHEMA = T.StructType(
    [
        T.StructField(
            "packages",
            T.MapType(
                T.StringType(),
                T.MapType(
                    T.StringType(),
                    T.StructType([T.StructField("time", T.StringType())]),
                ),
            ),
        )
    ]
)


def parse_composer(docs: DataFrame, pkg: str = "pkg", doc: str = "doc") -> DataFrame:
    """ComposerVersionAPI (package_managers.py:382-406): packages[pkg] map;
    versions containing 'dev' skipped; leading v/V stripped
    (cleaned_version, package_managers.py:377-379) but the time lookup uses
    the ORIGINAL version key."""
    j = F.from_json(F.col(doc), _COMPOSER_SCHEMA)
    kv = F.explode(j["packages"][F.col(pkg)])
    out = docs.select(F.col(pkg).alias("pkg"), kv.alias("raw_version", "info"))
    return out.where(~F.col("raw_version").contains("dev")).select(
        "pkg",
        F.regexp_replace("raw_version", r"^[vV]+", "").alias("version"),
        F.col("info.time").alias("release_date"),
    )


_HEX_SCHEMA = T.StructType(
    [
        T.StructField(
            "releases",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("version", T.StringType()),
                        T.StructField("inserted_at", T.StringType()),
                    ]
                )
            ),
        )
    ]
)


def parse_hex(docs: DataFrame, pkg: str = "pkg", doc: str = "doc") -> DataFrame:
    """HexVersionAPI (package_managers.py:408-424)."""
    r = F.explode(F.from_json(F.col(doc), _HEX_SCHEMA)["releases"])
    return docs.select(F.col(pkg).alias("pkg"), r.alias("r")).select(
        "pkg", F.col("r.version").alias("version"), F.col("r.inserted_at").alias("release_date")
    )


# ------------------------------------------------------------- XML/text --


def parse_maven_metadata(docs: DataFrame, pkg: str = "pkg", doc: str = "doc") -> DataFrame:
    """MavenVersionAPI.extract_versions (package_managers.py:341-345): every
    non-empty <version> element of maven-metadata.xml; no release dates."""
    v = F.explode(F.regexp_extract_all(F.col(doc), F.lit(r"<version>([^<]+)</version>"), 1))
    return docs.select(F.col(pkg).alias("pkg"), v.alias("version")).select(
        "pkg", "version", F.lit(None).cast("string").alias("release_date")
    )


def parse_goproxy_list(docs: DataFrame, pkg: str = "pkg", doc: str = "doc") -> DataFrame:
    """GoproxyVersionAPI (package_managers.py:486-541): ``@v/list`` text,
    one ``version [date]`` per line. Lines without a date keep a null
    release_date — the reference then fetches ``@v/{ver}.info`` per version,
    which is frontier I/O (enrich by joining the fetched info docs back)."""
    line = F.explode(F.split(F.col(doc), "\n"))
    out = docs.select(F.col(pkg).alias("pkg"), line.alias("line"))
    parts = F.split(F.trim("line"), r"\s+")
    return out.where(F.trim("line") != "").select(
        "pkg",
        parts[0].alias("version"),
        F.when(F.size(parts) > 1, parts[1]).alias("release_date"),
    )


PARSERS_BY_TYPE = {
    # VERSION_API_CLASSES_BY_PACKAGE_TYPE (package_managers.py:543-564);
    # 'deb' dispatches by namespace: debian -> sources.d.o, ubuntu -> launchpad
    "maven": parse_maven_metadata,
    "nuget": parse_nuget,
    "composer": parse_composer,
    "pypi": parse_pypi,
    "gem": parse_rubygems,
    "golang": parse_goproxy_list,
    "npm": parse_npm,
    "hex": parse_hex,
    "deb": parse_debian,
    "deb/ubuntu": parse_launchpad,
    "cargo": parse_crates,
}
