SELECT COUNT(*) FROM site as s, question as q, tag_question as tq, tag as t
WHERE q.site_id = s.site_id AND tq.site_id = s.site_id AND tq.question_id = q.id
  AND t.id = tq.tag_id AND t.site_id = s.site_id
  AND s.site_name = 'stackoverflow' AND t.name = 'python' AND q.score >= 5;
