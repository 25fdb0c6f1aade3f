"""Queue/DB backend tests: the RESP Redis client against an in-process
fake server, and the MySQL dialect via a mocked DB-API driver.

The reference's protocol surface: Redis list `por_batch_task_queue_<suffix>`
with LPUSH (dbtool main.go:217) / BRPOP (prover.go:74), and
SELECT ... FOR UPDATE claims (witness_model.go:129-152).
"""
import socket
import threading

import pytest

from zkpos_tpu.db.redis_backend import RedisClient, RedisTaskQueue


class FakeRedisServer(threading.Thread):
    """Just enough RESP2 to serve the commands the reference uses."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(4)
        self.port = self.sock.getsockname()[1]
        self.lists = {}
        self.commands = []
        self._stop = False

    def run(self):
        while not self._stop:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    def stop(self):
        self._stop = True
        self.sock.close()

    def _serve(self, conn):
        buf = b""

        def read_line():
            nonlocal buf
            while b"\r\n" not in buf:
                chunk = conn.recv(65536)
                if not chunk:
                    raise OSError
                buf += chunk
            line, rest = buf.split(b"\r\n", 1)
            return line, rest

        try:
            while True:
                line, buf = read_line()
                assert line[:1] == b"*"
                n = int(line[1:])
                args = []
                for _ in range(n):
                    line, buf = read_line()
                    assert line[:1] == b"$"
                    ln = int(line[1:])
                    while len(buf) < ln + 2:
                        buf += conn.recv(65536)
                    args.append(buf[:ln])
                    buf = buf[ln + 2:]
                conn.sendall(self._dispatch([a.decode() for a in args]))
        except OSError:
            pass

    def _dispatch(self, args) -> bytes:
        cmd = args[0].upper()
        self.commands.append(args)
        if cmd == "PING":
            return b"+PONG\r\n"
        if cmd == "LPUSH":
            self.lists.setdefault(args[1], [])
            for v in args[2:]:
                self.lists[args[1]].insert(0, v)
            return b":%d\r\n" % len(self.lists[args[1]])
        if cmd in ("RPOP", "BRPOP"):
            key = args[1]
            vals = self.lists.get(key, [])
            if not vals:
                return b"$-1\r\n" if cmd == "RPOP" else b"*-1\r\n"
            v = vals.pop().encode()
            if cmd == "RPOP":
                return b"$%d\r\n%s\r\n" % (len(v), v)
            k = key.encode()
            return (b"*2\r\n$%d\r\n%s\r\n$%d\r\n%s\r\n"
                    % (len(k), k, len(v), v))
        if cmd == "LLEN":
            return b":%d\r\n" % len(self.lists.get(args[1], []))
        if cmd == "DEL":
            existed = args[1] in self.lists
            self.lists.pop(args[1], None)
            return b":%d\r\n" % (1 if existed else 0)
        if cmd == "FLUSHALL":
            self.lists.clear()
            return b"+OK\r\n"
        return b"-ERR unknown command\r\n"


@pytest.fixture()
def fake_redis():
    srv = FakeRedisServer()
    srv.start()
    yield srv
    srv.stop()


def test_redis_task_queue_protocol(fake_redis):
    client = RedisClient("127.0.0.1", fake_redis.port, timeout=5.0)
    assert client.ping()
    q = RedisTaskQueue(client, suffix="test1")
    assert q.key == "por_batch_task_queue_test1"
    q.lpush(1, 2, 3)
    assert q.llen() == 3
    # FIFO through LPUSH/BRPOP (reference pushes heights in order and
    # provers pop oldest first)
    assert q.brpop(1.0) == "1"
    assert q.rpop() == "2"
    assert q.rpop() == "3"
    assert q.rpop() is None
    assert q.brpop(0) is None        # empty -> nil (prover exit signal)
    q.lpush(42)
    q.flush()
    assert q.llen() == 0
    # the wire really carried the reference's command set
    cmds = {c[0].upper() for c in fake_redis.commands}
    assert {"LPUSH", "BRPOP", "RPOP", "LLEN", "DEL"} <= cmds


def test_queue_from_config_selects_backend(fake_redis, tmp_path):
    from zkpos_tpu.db.redis_backend import queue_from_config
    from zkpos_tpu.db.queue import TaskQueue
    from zkpos_tpu.db.storage import open_database
    from zkpos_tpu.services.config import ServiceConfig

    db = open_database(str(tmp_path / "q.db"))
    cfg = ServiceConfig()
    assert isinstance(queue_from_config(cfg, db), TaskQueue)
    cfg.redis_addr = f"127.0.0.1:{fake_redis.port}"
    q = queue_from_config(cfg, db)
    assert isinstance(q, RedisTaskQueue)
    q.lpush(7)
    assert q.brpop(1.0) == "7"


# --- MySQL dialect via a mocked DB-API driver --------------------------------

class MockCursor:
    def __init__(self, log, rows=None):
        self.log = log
        self._rows = rows or []

    def execute(self, sql, params=()):
        self.log.append((sql, tuple(params)))

    def fetchone(self):
        return self._rows[0] if self._rows else None

    def fetchall(self):
        return list(self._rows)

    def close(self):
        pass


class MockConn:
    """pymysql-flavored connection (begin()); rows served per-query."""

    def __init__(self, log, rows):
        self.log = log
        self.rows = rows

    def cursor(self):
        return MockCursor(self.log, self.rows)

    def begin(self):
        self.log.append(("BEGIN", ()))

    def commit(self):
        self.log.append(("COMMIT", ()))

    def rollback(self):
        self.log.append(("ROLLBACK", ()))


def test_mysql_claim_carries_for_update():
    from zkpos_tpu.db.mysql_backend import MySQLDatabase
    from zkpos_tpu.db.storage import WitnessModel, STATUS_RECEIVED

    log = []
    rows = [(5, "payload", 0)]
    db = MySQLDatabase(lambda: MockConn(log, rows))
    model = WitnessModel(db, suffix="t")
    claimed = model.claim_witness_by_height(5)
    assert claimed is not None and claimed.status == STATUS_RECEIVED
    sqls = [s for s, _ in log]
    assert "BEGIN" in sqls and "COMMIT" in sqls
    select = next(s for s in sqls if s.lstrip().startswith("SELECT"))
    assert select.rstrip().endswith("FOR UPDATE"), select
    assert "MAX_EXECUTION_TIME(10000)" in select
    assert "%s" in select and "?" not in select
    update = next(s for s in sqls if s.lstrip().startswith("UPDATE"))
    assert "%s" in update


def test_mysql_portable_begin_with_start_transaction():
    from zkpos_tpu.db.mysql_backend import _begin

    class ConnectorConn:
        def __init__(self):
            self.started = False

        def start_transaction(self):
            self.started = True

    c = ConnectorConn()
    _begin(c)
    assert c.started

    class PlainConn:
        def __init__(self):
            self.log = []

        def cursor(self):
            outer = self

            class Cur:
                def execute(self, sql):
                    outer.log.append(sql)

                def close(self):
                    pass
            return Cur()

    p = PlainConn()
    _begin(p)
    assert p.log == ["BEGIN"]
