SELECT COUNT(*) FROM users as u, badges as b, comments as c WHERE b.UserId = u.Id AND c.UserId = u.Id AND u.Reputation<=567 AND u.Views>=189 AND u.UpVotes<=367;
