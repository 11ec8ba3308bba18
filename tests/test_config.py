"""Config model — KAFI_HOME YAML resolution (reference:
kafi/storage.py:140-188)."""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def kafi_home(tmp_path, monkeypatch):
    monkeypatch.setenv("KAFI_HOME", str(tmp_path))
    (tmp_path / "configs" / "locals").mkdir(parents=True)
    return tmp_path


def _write(path, text):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text)


def test_load_resolves_and_defaults(kafi_home, tmp_path):
    from kafi_spark.config import load_config

    _write(
        tmp_path / "configs" / "locals" / "mystore.yaml",
        "local:\n  root.dir: /tmp/x\n",
    )
    cfg = load_config("mystore", "locals", mandatory=["local"])
    assert cfg["local"]["root.dir"] == "/tmp/x"
    assert cfg["kafi"]["value.type"] == "json"  # defaulted knob
    assert cfg["kafi"]["topic.ignore.patterns"] == ["_*"]
    assert cfg["schema_registry"] == {}


def test_later_search_path_overrides(kafi_home, tmp_path):
    from kafi_spark.config import load_config

    _write(
        tmp_path / "configs" / "locals" / "s.yaml",
        "local:\n  root.dir: /from/kind/dir\n",
    )
    # the reference's search loop keeps going: a file at the home root
    # WINS over the kind directory
    _write(tmp_path / "s.yaml", "local:\n  root.dir: /from/home\n")
    cfg = load_config("s", "locals", mandatory=["local"])
    assert cfg["local"]["root.dir"] == "/from/home"


def test_missing_file_and_missing_section(kafi_home, tmp_path):
    from kafi_spark.config import load_config

    with pytest.raises(FileNotFoundError):
        load_config("nope", "locals", mandatory=["local"])
    _write(tmp_path / "configs" / "locals" / "bad.yaml", "other: {}\n")
    with pytest.raises(KeyError):
        load_config("bad", "locals", mandatory=["local"])


def test_kafi_knob_override(kafi_home, tmp_path):
    from kafi_spark.config import load_config

    _write(
        tmp_path / "configs" / "locals" / "k.yaml",
        "local:\n  root.dir: /tmp/k\nkafi:\n  value.type: str\n",
    )
    cfg = load_config("k", "locals", mandatory=["local"])
    assert cfg["kafi"]["value.type"] == "str"
    assert cfg["kafi"]["key.type"] == "str"  # untouched default


def test_list_configs(kafi_home, tmp_path):
    from kafi_spark.config import list_configs

    _write(tmp_path / "configs" / "locals" / "a.yaml", "local: {}\n")
    _write(tmp_path / "configs" / "locals" / "b.yml", "local: {}\n")
    _write(tmp_path / "configs" / "locals" / "b.txt", "x")
    assert list_configs("locals") == ["a", "b"]
    assert list_configs("locals", "a*") == ["a"]


def test_local_from_config_and_ignore_patterns(kafi_home, tmp_path, spark):
    from kafi_spark.storage import Local

    _write(
        tmp_path / "configs" / "locals" / "store.yaml",
        f"local:\n  root.dir: {tmp_path}/store_root\n"
        "kafi:\n  topic.ignore.patterns: ['_*', 'sys.*']\n",
    )
    c = Local.from_config(spark, "store")
    assert c.root == f"{tmp_path}/store_root"
    c.create("visible", partitions=1)
    c.create("_internal", partitions=1)
    c.create("sys.audit", partitions=1)
    assert c.topics() == ["visible"]
    # base-class listing still sees everything (admin access)
    from kafi_spark.sources.fs_topic import FSTopicStorage

    assert FSTopicStorage.topics(c) == ["_internal", "sys.audit", "visible"]
    assert Local.configs() == ["store"]


def test_resolve_s3_and_azure_configs(kafi_home, tmp_path, spark):
    from kafi_spark.storage import resolve_storage_config

    _write(
        tmp_path / "configs" / "s3s" / "mys3.yaml",
        's3:\n  endpoint: "minio:9000"\n  access.key: "ak"\n'
        '  secret.key: "sk"\n  bucket.name: "bkt"\n',
    )
    root = resolve_storage_config(spark, "s3", "mys3")
    assert root == "s3a://bkt"
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "minio:9000"
    assert hconf.get("fs.s3a.access.key") == "ak"
    assert hconf.get("fs.s3a.path.style.access") == "true"

    _write(
        tmp_path / "configs" / "azureblobs" / "myaz.yaml",
        "azure_blob:\n"
        "  connection.string: AccountName=acct;AccountKey=kk==;Proto=http\n"
        "  container.name: cont\n",
    )
    root = resolve_storage_config(spark, "azure_blob", "myaz")
    assert root == "wasbs://cont@acct.blob.core.windows.net"
    assert hconf.get("fs.azure.account.key.acct.blob.core.windows.net") == "kk=="

    import pytest as _pytest
    with _pytest.raises(ValueError):
        resolve_storage_config(spark, "gcs", "x")


def test_empty_yaml_section_normalizes_to_dict(kafi_home, tmp_path):
    """Round-8 review: a section left empty in YAML ('local:') parses
    to None, which passed the mandatory check and then crashed later
    with 'NoneType is not subscriptable'; it now normalizes to {} so
    missing keys fail with the intended KeyError."""
    import os

    from kafi_spark.config import load_config

    d = os.path.join(kafi_home, "configs", "locals")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "emptysec.yaml"), "w") as f:
        f.write("local:\nschema_registry:\n")
    cfg = load_config("emptysec", "locals", mandatory=["local"],
                      optional=["schema_registry"])
    assert cfg["local"] == {}
    assert cfg["schema_registry"] == {}
