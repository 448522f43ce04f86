-- Seed for the real-MySQL SchemaWalk harness (MySqlWalkSpec).
-- Exercises the MySQL-specific shapes the Derby golden tests cannot:
--   * UNSIGNED BIGINT primary key holding a value past signed-Long range
--   * tinyint(1) (Connector/J default would reinterpret as BIT/boolean)
--   * legacy zero dates '0000-00-00' (needs sql_mode='', set in compose)
--   * lower-case preserved identifiers (Linux lower_case_table_names=0)
-- Schema shape mirrors the reference's test database (a fact table with
-- a lookup and a child), not its content.

CREATE TABLE nation (
  n_nationkey INT NOT NULL PRIMARY KEY,
  n_name VARCHAR(25)
);

CREATE TABLE customer (
  c_custkey BIGINT UNSIGNED NOT NULL PRIMARY KEY,
  c_name VARCHAR(40),
  c_active TINYINT(1) NOT NULL DEFAULT 1,
  c_since DATETIME,
  c_nationkey INT,
  CONSTRAINT c_fk_nation FOREIGN KEY (c_nationkey) REFERENCES nation (n_nationkey)
);

CREATE TABLE orders (
  o_orderkey BIGINT NOT NULL PRIMARY KEY,
  o_custkey BIGINT UNSIGNED,
  o_orderdate DATE,
  CONSTRAINT o_fk_cust FOREIGN KEY (o_custkey) REFERENCES customer (c_custkey)
);

INSERT INTO nation VALUES (1, 'FRANCE'), (2, 'GERMANY');

INSERT INTO customer VALUES
  (1, 'alice', 1, '2020-01-02 03:04:05', 1),
  -- unsigned range beyond signed Long.MaxValue + a legacy zero date
  (18446744073709551614, 'bob', 0, '0000-00-00 00:00:00', 2);

INSERT INTO orders VALUES
  (10, 1, '2020-02-01'),
  (11, 18446744073709551614, '0000-00-00');
