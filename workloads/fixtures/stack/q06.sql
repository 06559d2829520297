SELECT COUNT(*) FROM question as q, tag_question as tq, tag as t
WHERE tq.question_id = q.id AND tq.site_id = q.site_id AND t.id = tq.tag_id
  AND t.name IN ('python','javascript','java') AND q.view_count >= 5000;
