-- Golden SQL corpus, modeled on the reference's
-- hudi-spark-datasource/.../resources/sql-statements.sql executed by
-- TestSqlStatement.scala: each statement runs through HudiSqlSession;
-- "-- expect" lines pin the sorted result rows of the next SELECT-like
-- statement as JSON, "-- expect rows=N" pins only the row count.
-- ${DIR} expands to a per-run scratch directory, ${TYPE} to cow|mor.

CREATE TABLE t1 (id bigint, name string, price double, ts bigint) USING hudi
  PARTITIONED BY (name)
  TBLPROPERTIES (primaryKey='id', preCombineField='ts', type='${TYPE}')
  LOCATION '${DIR}/t1';

INSERT INTO t1 VALUES (1, 'a1', 10.0, 1000);
INSERT INTO t1 VALUES (2, 'a2', 20.0, 1000), (3, 'a3', 30.0, 1000);

-- expect [[1, "a1", 10.0, 1000], [2, "a2", 20.0, 1000], [3, "a3", 30.0, 1000]]
SELECT id, name, price, ts FROM t1 ORDER BY id;

UPDATE t1 SET price = price * 2 WHERE id > 1;

-- expect [[1, 10.0], [2, 40.0], [3, 60.0]]
SELECT id, price FROM t1 ORDER BY id;

MERGE INTO t1 USING (
  SELECT 1 AS id, 'a1' AS name, 101.0 AS price, 2000 AS ts
  UNION ALL SELECT 4, 'a4', 400.0, 2000
) src ON t1.id = src.id
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *;

-- expect [[1, 101.0], [2, 40.0], [3, 60.0], [4, 400.0]]
SELECT id, price FROM t1 ORDER BY id;

MERGE INTO t1 USING (SELECT 2 AS id, 'a2' AS name, 0.0 AS price) s ON t1.id = s.id
WHEN MATCHED AND s.price = 0.0 THEN DELETE;

-- expect [[1], [3], [4]]
SELECT id FROM t1 ORDER BY id;

DELETE FROM t1 WHERE id = 4;

-- expect rows=2
SELECT id FROM t1;

-- partitions persist until cleaned (reference semantics: files of the
-- deleted rows' partitions remain listed until clean)
-- expect [["name=a1"], ["name=a2"], ["name=a3"], ["name=a4"]]
SHOW PARTITIONS t1;

ALTER TABLE t1 ADD COLUMNS (flag string);

-- expect [[1, null], [3, null]]
SELECT id, flag FROM t1 ORDER BY id;

ALTER TABLE t1 DROP PARTITION (name='a3');

-- expect [[1]]
SELECT id FROM t1 ORDER BY id;

CREATE TABLE t2 USING hudi
  TBLPROPERTIES (primaryKey='id', preCombineField='ts')
  LOCATION '${DIR}/t2'
  AS SELECT id, price, ts FROM t1;

-- expect [[1, 101.0]]
SELECT id, price FROM t2 ORDER BY id;

TRUNCATE TABLE t2;

-- expect rows=0
SELECT * FROM t2;

ALTER TABLE t2 RENAME TO t2_renamed;

INSERT INTO t2_renamed VALUES (9, 9.0, 9000);

-- expect [[9, 9.0]]
SELECT id, price FROM t2_renamed ORDER BY id;
