package graft

import graft.tools.Migrate

/** The mriya.py CLI pipeline end-to-end: INI config -> mapping list ->
  * generated source data -> connector migration with write-back. */
class MigrateCliSuite extends SparkSuite {

  private val ini = """
    [src]
    username = u1@example.org
    password = p1
    url = https://s.example.com
    [dst]
    username = u2@example.org
    password = p2
    url = https://d.example.com
    [gen]
    records = 40
    columns = Name:text,Amount:int
  """

  private val mapping = """
    [{"source_object": "Account",
      "destination_object": "Accounts__c",
      "where_condition": "Amount >= 0",
      "mapping": [
        {"table_src": "Account", "column_src": "Id",
         "table_dst": "Accounts__c", "column_dst": "Old_Record_Id__c",
         "operation": "copy", "column_type": "src_id"},
        {"table_src": "Account", "column_src": "Name",
         "table_dst": "Accounts__c", "column_dst": "Name",
         "operation": "copy", "column_type": "regular"},
        {"table_src": "Account", "column_src": "New_Id__c",
         "table_dst": "Accounts__c", "column_dst": "Id",
         "operation": "upd_src", "column_type": "dst_id"}]}]
  """

  test("CLI pipeline: generate -> insert -> migrate -> write-back") {
    val results = Migrate.run(spark, ini, mapping)
    assert(results == Seq(("Accounts__c", 40L, 40L, 40L)))
  }

  test("CLI rejects a config missing required connection keys") {
    val bad = ini.replace("password = p1\n", "")
    val e = intercept[IllegalArgumentException](Migrate.run(spark, bad, mapping))
    assert(e.getMessage.contains("password"))
  }
}
