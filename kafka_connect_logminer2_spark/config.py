"""Engine configuration — mirrors the reference's full 19-key config surface.

Reference: OracleSourceConnectorConfig2.java:13-84 (key names kept verbatim,
dots → underscores in attribute names). Keys that are Oracle-connection
plumbing (host/port/sid) are retained for config-surface parity but unused by
the Spark engine, which reads redo events from Kafka/files instead of JDBC.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields


@dataclass
class EngineConfig:
    """Typed config for the CDC engine.

    Attribute ↔ reference key mapping (OracleSourceConnectorConfig2.java:13-43):
      name                  ← name
      db_name_alias         ← db.name.alias
      topic                 ← topic        ("" → dynamic per-table routing)
      db_name               ← db.name
      db_host_name          ← db.hostname          (unused on Spark)
      db_port               ← db.port              (unused on Spark)
      db_user               ← db.user              (unused on Spark)
      db_user_password      ← db.user.password     (unused on Spark)
      db_fetch_size         ← db.fetch.size   → maxOffsetsPerTrigger analog
      table_whitelist       ← table.whitelist  "OWNER.TABLE,OWNER.*"
      table_blacklist       ← table.blacklist
      parse_dml_data        ← parse.dml.data
      reset_offset          ← reset.offset
      start_scn             ← start.scn
      multitenant           ← multitenant
      dml_types             ← dml.types  csv of INSERT/UPDATE/DELETE
      map_unescaped_strings ← map.unescaped.strings (Issue #71 behavior)
      heartbeat_table       ← heartbeat.table
      using_cm              ← using.cm (OracleSourceConnectorConfig2.java:30)
    """

    name: str = "logminer"
    db_name_alias: str = "db"
    topic: str = ""
    db_name: str = ""
    db_host_name: str = ""
    db_port: int = 1521
    db_user: str = ""
    db_user_password: str = ""
    db_fetch_size: int = 10_000
    table_whitelist: str = ""
    table_blacklist: str = ""
    parse_dml_data: bool = True
    reset_offset: bool = False
    start_scn: str = ""
    multitenant: bool = False
    dml_types: str = "INSERT,UPDATE,DELETE"
    map_unescaped_strings: bool = True
    heartbeat_table: str = ""
    # CONTINUOUS_MINE selection (reference OracleSourceConnectorConfig2.java:30,
    # consumed at OracleSourceTask2.java:127-131): the CM path is taken only
    # when this is true AND the source DB version predates Oracle 19c's CM
    # de-support — connector.cm_path_selected owns that fork
    using_cm: bool = False

    # Spark-engine additions (what the reference lacks — SURVEY §7 hard part 6)
    txn_state_timeout_ms: int = 3_600_000  # evict abandoned XIDs after 1 h
    float64_numbers: bool = True  # reference NUMBER(p,s>0)→FLOAT64 semantics
    # A15 hot-transaction route (cdc.skew.salts): 'auto' samples the xid
    # column per batch (~1% of a scan) and switches assembly's fact
    # annotation to the salted aggregate+join when one xid holds ≥5% of
    # the log — the measured 5.6→3.2 s win on the 10%-hot fixture
    # (BASELINE.md). 'off' pins the single-window route; an integer pins
    # that salt count. Default 'auto': every engine source (redo parquet
    # dirs, persisted fb carry-over unions) is rescannable, which is the
    # one precondition sampling needs.
    cdc_skew_salts: str = "auto"

    def dml_type_set(self) -> set[str]:
        return {t.strip().upper() for t in self.dml_types.split(",") if t.strip()}

    def skew_salts_arg(self) -> int | str | None:
        """``cdc_skew_salts`` → the assemble_transactions argument:
        'auto' passes through, 'off'/'' → None (window route), digits →
        that salt count. Anything else raises at config time, not mid-job."""
        v = self.cdc_skew_salts.strip().lower()
        if v == "auto":
            return "auto"
        if v in ("off", "none", ""):
            return None
        if v.isdigit():
            return int(v)
        raise ValueError(
            f"cdc.skew.salts must be 'auto', 'off', or an integer, got {self.cdc_skew_salts!r}"
        )

    @classmethod
    def from_connect_map(cls, props: dict[str, str]) -> "EngineConfig":
        """Build from a Kafka-Connect-style properties map (dotted keys)."""
        key_map = {f.name.replace("_", "."): f.name for f in fields(cls)}
        kwargs = {}
        for k, v in props.items():
            attr = key_map.get(k)
            if attr is None:
                continue
            ftype = {f.name: f.type for f in fields(cls)}[attr]
            if ftype == "bool":
                kwargs[attr] = str(v).lower() in ("1", "true", "yes")
            elif ftype == "int":
                kwargs[attr] = int(v)
            else:
                kwargs[attr] = v
        return cls(**kwargs)
