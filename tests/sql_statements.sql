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

-- ===== r7 surface (VERDICT r7 #7) =====

-- virtual keys through TBLPROPERTIES: files carry no meta columns,
-- reads derive them (SELECT on _hoodie_record_key proves the derive)
CREATE TABLE vk (id bigint, name string, price double, ts bigint) USING hudi
  PARTITIONED BY (name)
  TBLPROPERTIES (primaryKey='id', preCombineField='ts', type='${TYPE}',
                 'hoodie.populate.meta.fields'='false')
  LOCATION '${DIR}/vk';

INSERT INTO vk VALUES (1, 'v1', 10.0, 1000), (2, 'v2', 20.0, 1000);

UPDATE vk SET price = price + 5 WHERE id = 2;

-- expect [["1", 10.0], ["2", 25.0]]
SELECT _hoodie_record_key, price FROM vk ORDER BY id;

MERGE INTO vk USING (SELECT 3 AS id, 'v3' AS name, 30.0 AS price, 2000 AS ts) s
ON vk.id = s.id
WHEN NOT MATCHED THEN INSERT *;

-- expect rows=3
SELECT id FROM vk;

-- compaction admin via SQL: schedule, run the pending plan, and a
-- second RUN with nothing scheduled (fresh schedule-and-execute on
-- mor, clean no-op on cow); data unchanged throughout
SCHEDULE COMPACTION ON vk;

RUN COMPACTION ON vk;

-- expect rows=0
SHOW COMPACTION ON vk;

RUN COMPACTION ON vk;

-- expect [[1, 10.0], [2, 25.0], [3, 30.0]]
SELECT id, price FROM vk ORDER BY id;

-- archived instants stay SHOW-able after tiered consolidation:
-- keep 2-3 commits; batch size 1 forces a consolidation as soon as a
-- second archive batch lands (the trigger is STRICTLY-greater-than,
-- so '2' with only two batches would never consolidate)
CREATE TABLE arc (id bigint, v bigint) USING hudi
  TBLPROPERTIES (primaryKey='id', preCombineField='v', type='${TYPE}',
                 'hoodie.keep.min.commits'='2', 'hoodie.keep.max.commits'='3',
                 'hoodie.archive.merge.files.batch.size'='1')
  LOCATION '${DIR}/arc';

INSERT INTO arc VALUES (1, 1);
INSERT INTO arc VALUES (2, 1);
INSERT INTO arc VALUES (3, 1);
INSERT INTO arc VALUES (4, 1);
INSERT INTO arc VALUES (5, 1);
INSERT INTO arc VALUES (6, 1);

-- 6 commits, keep_min 2: four archived (folded through consolidation)
-- expect rows=4
SHOW ARCHIVED COMMITS ON arc;

-- expect rows=6
SELECT id FROM arc;
