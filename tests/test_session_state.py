"""`hh cd / pwd` session-state semantics."""

from __future__ import annotations

from hadoop_tools_spark.sources import session_state as ss


def test_cd_pwd_resolve(tmp_path, monkeypatch):
    monkeypatch.setenv(ss.STATE_FILE_ENV, str(tmp_path / "cwd"))
    assert ss.pwd() == "/"
    assert ss.cd("/user/alice") == "/user/alice"
    assert ss.pwd() == "/user/alice"
    assert ss.resolve("logs/2024") == "/user/alice/logs/2024"
    assert ss.cd("..") == "/user"
    assert ss.resolve(".") == "/user"
    assert ss.resolve("/abs/path") == "/abs/path"
    assert ss.resolve("hdfs://nn:8020/x") == "hdfs://nn:8020/x"
    # persisted across "processes" (fresh read)
    assert ss.pwd() == "/user"
